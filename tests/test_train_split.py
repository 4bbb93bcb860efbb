"""Deterministic content-hash train/val/test split vs DuckDB oracle
(pytest-side correctness row — the driver's 50-entry cap is full)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from derzis_spark.pipeline_queries import (
    SQL_TRAIN_SPLIT,
    assign_split,
    q_train_split,
)
from derzis_spark.queries import TABLES, load
from tests.test_entry_queries import norm_rows


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_split_matches_oracle(spark, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sdf = q_train_split(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    cur = con.execute(SQL_TRAIN_SPLIT)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(o_cols)
    assert norm_rows(s_cols, s_rows) == norm_rows(o_cols, o_rows)
    # ~900/50/50 permille split, every doc in exactly one bucket
    by = {r[0]: r[1] for r in s_rows}
    n = sum(by.values())
    assert set(by) == {"train", "val", "test"}
    assert 0.85 < by["train"] / n < 0.95


def test_split_is_content_addressed(spark):
    """Exact duplicate texts land in the SAME split regardless of
    doc_id (the leakage property a positional/random split lacks),
    and the assignment is invariant to row order."""
    sf = "/root/testdata/sf0.001"
    d = load(spark, sf, "documents")
    dup = d.limit(20).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000))
    both = assign_split(d.unionByName(dup))
    per_text = (both.groupBy("text")
                .agg(F.countDistinct("split").alias("k")))
    assert per_text.agg(F.max("k")).collect()[0][0] == 1
    a = sorted(map(tuple, assign_split(d).select(
        "doc_id", "split").collect()))
    b = sorted(map(tuple, assign_split(
        d.orderBy(F.desc("doc_id"))).select(
        "doc_id", "split").collect()))
    assert a == b
