"""TF-IDF top-terms vs DuckDB oracle at two fixture sizes (the
pytest-side equivalent of a driver correctness row — the driver's
50-entry cap is full, so this op is oracle-checked here instead)."""

import duckdb
import pytest

from derzis_spark.pipeline_queries import (
    SQL_TFIDF_TOP_TERMS,
    TFIDF_TOP_K,
    q_tfidf_top_terms,
)
from derzis_spark.queries import TABLES
from tests.test_entry_queries import norm_rows


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_tfidf_matches_oracle(spark, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sdf = q_tfidf_top_terms(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    cur = con.execute(SQL_TFIDF_TOP_TERMS)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows)
    assert norm_rows(s_cols, s_rows) == norm_rows(o_cols, o_rows)
    # exactly top-k per doc, rank contiguous from 1
    by_doc = {}
    for r in s_rows:
        by_doc.setdefault(r[0], []).append(r[3])
    assert all(sorted(v) == list(range(1, len(v) + 1))
               and len(v) <= TFIDF_TOP_K for v in by_doc.values())


def test_tfidf_deterministic_ties(spark):
    """Equal-tfidf terms rank by term order — two runs give identical
    rows (the hash-parity property every driver row relies on)."""
    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, q_tfidf_top_terms(spark, sf).collect()))
    b = sorted(map(tuple, q_tfidf_top_terms(spark, sf).collect()))
    assert a == b
