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


def test_simhash64_fast_matches_pure_python_fold(spark):
    """The 64-bit SimHash fast variant (JVM hash-agg + banding +
    popcount verify) must equal a pure-Python reimplementation fed the
    SAME JVM base hashes — validating every step above the hash
    primitive (votes, fingerprint assembly, banding, bucket cap,
    keeper edges, Hamming verify) independently of Spark."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from derzis_spark.pipeline_queries import (
        JACCARD_BUCKET_CAP, SIMHASH64_BANDS, SIMHASH64_BITS_PER_BAND,
        SIMHASH_HAMMING_MAX, load, q_simhash64_near_dup_fast, _words)

    # base hashes via Spark (xxhash64 is JVM-only), fold in Python
    d = load(spark, SF_DIR, "documents")
    base = d.select("doc_id", F.explode(_words()).alias("w")) \
        .select("doc_id", F.xxhash64(F.col("w")).alias("h")).collect()
    votes = defaultdict(lambda: [0] * 64)
    for r in base:
        h = r["h"] & 0xFFFFFFFFFFFFFFFF
        v = votes[r["doc_id"]]
        for k in range(64):
            v[k] += 1 if (h >> k) & 1 else -1
    fps = {}
    for doc, v in votes.items():
        fp = sum(1 << k for k in range(64) if v[k] > 0)
        # Spark longs are signed 64-bit
        fps[doc] = fp - (1 << 64) if fp >= (1 << 63) else fp
    mask = (1 << SIMHASH64_BITS_PER_BAND) - 1
    buckets = defaultdict(list)
    for doc, fp in fps.items():
        u = fp & 0xFFFFFFFFFFFFFFFF
        for b in range(SIMHASH64_BANDS):
            buckets[(b, (u >> (SIMHASH64_BITS_PER_BAND * b)) & mask)] \
                .append(doc)
    cand = set()
    for members in buckets.values():
        members.sort()
        if len(members) <= JACCARD_BUCKET_CAP:
            for i, a in enumerate(members):
                for b in members[i + 1:]:
                    cand.add((a, b))
        else:
            for b in members[1:]:
                cand.add((members[0], b))
    expect = sorted(
        (a, b, bin((fps[a] ^ fps[b]) & 0xFFFFFFFFFFFFFFFF).count("1"))
        for (a, b) in cand
        if bin((fps[a] ^ fps[b]) & 0xFFFFFFFFFFFFFFFF).count("1")
        <= SIMHASH_HAMMING_MAX)
    got = sorted(tuple(r) for r in
                 q_simhash64_near_dup_fast(spark, SF_DIR).collect())
    assert got == expect
