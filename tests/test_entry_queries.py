"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB, compare row count +
column names + order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from derzis_spark.queries import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(v):
    # Mirror the driver's stringified value-hash: 14 (BIGINT) and 14.0
    # (DOUBLE) must NOT compare equal, or int/float drift passes locally
    # but hash-fails in CORRECTNESS (VERDICT r1 "What's wrong" #1).
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(normalize(r[i]) for i in idx) for r in rows
    )


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    cur = ddb.execute(entry_mod.oracle_sql()[name])
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()

    assert sorted(s_cols) == sorted(d_cols), \
        f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), \
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    sn, dn = norm_rows(s_cols, s_rows), norm_rows(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_every_query_has_an_oracle(spark):
    """Since the iterative entries froze their deterministic outputs as
    VALUES literals (scripts/freeze_oracles.py), every queries() entry
    is value-hash-checked — zero rows-only cells."""
    qs = entry_mod.queries()
    oracle = entry_mod.oracle_sql()
    assert sorted(qs.keys()) == sorted(oracle.keys())
