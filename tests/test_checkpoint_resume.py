"""Deterministic mid-frontier resume (north rule): a crawl stopped at
round k and resumed from the latest snapshot must produce exactly the
trace/state of the uninterrupted run — the Spark replacement for the
reference's crash recovery that resets in-flight statuses
(manager/src/lib/RunningJobs.ts:204-277)."""

import pytest

from derzis_spark.config import CrawlConfig
from derzis_spark.engine import CrawlEngine
from derzis_spark.fixtures import generate_fixture
from derzis_spark.oracle import run_oracle_on_fixture
from derzis_spark.storage import SnapshotStore
from tests.conftest import fixture_dataframes
from tests.test_engine_matches_oracle import (
    assert_match, engine_trace_tuples, oracle_trace_tuples)


CFG = CrawlConfig(max_path_length=3, max_path_props=2,
                  resources_per_domain=2, max_rounds=8)


@pytest.mark.slow
def test_resume_matches_uninterrupted_run(spark, tmp_path):
    fx = generate_fixture(n_pages=60, n_origins=4, n_seeds=3, seed=42)
    oracle = run_oracle_on_fixture(fx, CFG)

    # run 1: crawl 3 rounds with a snapshot store, then "crash"
    pages, robots, seeds = fixture_dataframes(spark, fx)
    eng1 = CrawlEngine(spark, pages, robots, CFG,
                       work_dir=str(tmp_path / "snaps"))
    eng1.run(seeds, max_rounds=3)
    assert eng1.round == 3

    # run 2: a fresh engine resumes from the latest snapshot only
    eng2 = CrawlEngine(spark, pages, robots, CFG,
                       work_dir=str(tmp_path / "snaps"))
    eng2.resume()
    assert eng2.round == 3
    eng2.run(max_rounds=CFG.max_rounds)

    assert_match(oracle, eng2)


@pytest.mark.slow
def test_snapshot_manifest_lineage(spark, tmp_path):
    fx = generate_fixture(n_pages=40, n_origins=3, n_seeds=2, seed=7)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    eng = CrawlEngine(spark, pages, robots, CFG,
                      work_dir=str(tmp_path / "snaps"))
    eng.run(seeds, max_rounds=2)
    store = SnapshotStore(str(tmp_path / "snaps"))
    latest = store.latest_round()
    assert latest == 2
    man = store.read_manifest(latest)
    # per-table lineage + per-round fetch metrics in every manifest
    for t in ("resources", "domains", "paths", "triples", "trace"):
        assert t in man["tables"]
        assert man["tables"][t]["rows"] >= 0
    assert man["metrics"]["round"] == 2
    assert "scheduled" in man["metrics"]
    # trace prefix property: snapshot r1's trace is a prefix of r2's
    t1 = store.load_tables(spark, 1)["trace"].orderBy("round", "seq")
    t2 = store.load_tables(spark, 2)["trace"].orderBy("round", "seq")
    rows1 = [tuple(r) for r in t1.collect()]
    rows2 = [tuple(r) for r in t2.collect()]
    assert rows2[: len(rows1)] == rows1


@pytest.mark.slow
def test_snapshot_bucket_partitioning(spark, tmp_path):
    """Snapshots write the big tables hash-bucketed (the Iceberg
    bucket(n, key) transform) with per-bucket row counts in the
    manifest — the north rule's partition lineage."""
    import os

    fx = generate_fixture(n_pages=40, n_origins=3, n_seeds=2, seed=7)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    eng = CrawlEngine(spark, pages, robots, CFG,
                      work_dir=str(tmp_path / "snaps"))
    eng.run(seeds, max_rounds=2)
    store = SnapshotStore(str(tmp_path / "snaps"))
    man = store.read_manifest(store.latest_round())
    for t in ("resources", "paths", "triples"):
        info = man["tables"][t]
        assert info["n_buckets"] == 16
        assert sum(info["partitions"].values()) == info["rows"]
        # physical layout: the bucket values across the path chain
        # (a delta-committed table is base + appended delta dirs)
        # cover exactly the manifest's per-bucket lineage keys
        buckets = set()
        for path in SnapshotStore.table_paths(info):
            buckets |= {d.split("=", 1)[1] for d in os.listdir(path)
                        if d.startswith("_bucket=")}
        assert buckets == set(info["partitions"])
    # loading drops the synthetic bucket column
    tables = store.load_tables(spark, store.latest_round())
    assert "_bucket" not in tables["resources"].columns
