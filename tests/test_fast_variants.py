"""Production fast-path variants: must be deterministic and agree with
the oracle-parity implementation on everything except the token hash
function itself."""

import os

from derzis_spark.pipeline_queries import (
    N_MINHASH64, q_minhash64_signatures, q_minhash64_signatures_fast)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_minhash64_fast_shape_and_determinism(spark):
    slow = q_minhash64_signatures(spark, SF_DIR)
    fast = q_minhash64_signatures_fast(spark, SF_DIR)
    # same schema and the same (doc_id, h) key space — one signature
    # per document per permutation
    assert fast.columns == slow.columns
    assert [f.dataType for f in fast.schema.fields] == \
        [f.dataType for f in slow.schema.fields]
    assert fast.count() == slow.count()
    n_docs = fast.select("doc_id").distinct().count()
    assert fast.count() == n_docs * N_MINHASH64
    # deterministic: two evaluations produce identical rows
    a = sorted(tuple(r) for r in fast.collect())
    b = sorted(tuple(r) for r in q_minhash64_signatures_fast(
        spark, SF_DIR).collect())
    assert a == b
