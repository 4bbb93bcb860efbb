"""Merge-on-read UPSERT deltas for the MUTABLE snapshot tables
(resources / domains / paths) — the round-5 close of the last
O(store)-per-round commit cost: statuses, clocks and counters flip in
place every round, so full rewrites scale with the STORE while the
actual change set is schedule-bounded. Each mutation site records its
touched keys; the commit writes only those rows (Iceberg v2
merge-on-read MERGE semantics) and readers reconcile last-writer-wins
per key. Everything must stay invisible to every reader: the oracle
trace match, resume, manifest row counts, compaction.

Reference semantics under test: the per-round status/clock writes of
models/src/Resource.ts:70-99, Domain.ts:117-150 and
Path/TraversalPath.ts:179-197 (Mongo in-place $set updates) — here as
update deltas over the snapshot chain instead of table rewrites."""

import pytest

from derzis_spark.config import CrawlConfig
from derzis_spark.engine import CrawlEngine
from derzis_spark.fixtures import generate_fixture
from derzis_spark.oracle import run_oracle_on_fixture
from derzis_spark.storage import SnapshotStore
from tests.conftest import fixture_dataframes
from tests.test_engine_matches_oracle import assert_match


CFG = CrawlConfig(max_path_length=3, max_path_props=2,
                  resources_per_domain=2, max_rounds=8)

MUT = ("resources", "domains", "paths")


def _chain(info):
    return SnapshotStore.table_paths(info)


def _force_upserts(eng: CrawlEngine) -> None:
    eng.snapshot_upsert_min_rows = 0
    eng.snapshot_delta_min_rows = 0


@pytest.mark.slow
def test_upsert_chain_exact_with_per_commit_validation(spark, tmp_path):
    """Forced upserts at fixture scale: every commit's reconciled read
    surface must equal the in-memory truth bit-for-bit (the validation
    hook re-loads and exceptAll-compares after each commit — any
    mutation site missing its _touch_* call fails here), the final
    trace must match the oracle exactly, and the manifests must carry
    exact reconciled row counts plus per-delta lineage."""
    fx = generate_fixture(seed=1106, n_pages=60, n_origins=6, n_seeds=3)
    oracle = run_oracle_on_fixture(fx, CFG)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    root = str(tmp_path / "snaps")
    eng = CrawlEngine(spark, pages, robots, CFG, work_dir=root)
    _force_upserts(eng)
    eng.snapshot_validate_upserts = True
    eng.run(seeds)
    assert_match(oracle, eng)

    store = SnapshotStore(root)
    last = store.latest_round()
    saw_chain = {t: False for t in MUT}
    for rnd in range(last + 1):
        man = store.read_manifest(rnd)
        for t in MUT:
            info = man["tables"][t]
            if len(_chain(info)) > 1:
                saw_chain[t] = True
                assert info["merge_key"] == CrawlEngine.MUT_KEYS[t]
                lineage = info["delta_lineage"]
                assert len(lineage) == len(_chain(info)) - 1
                # every delta dir's lineage row records its write
                assert all(e["rows"] > 0 for e in lineage)
    assert all(saw_chain.values()), saw_chain

    # manifest row counts equal the reconciled truth
    man = store.read_manifest(last)
    tables = store.load_tables(spark, last)
    for t in MUT:
        assert man["tables"][t]["rows"] == tables[t].count(), t


@pytest.mark.slow
def test_resume_from_upsert_chain_matches_uninterrupted(spark, tmp_path):
    """Mid-frontier resume over merge-on-read chains: a crawl stopped
    at round 3 and resumed from the reconciled snapshot finishes with
    the exact oracle trace — reconcile is invisible to recovery."""
    fx = generate_fixture(n_pages=60, n_origins=4, n_seeds=3, seed=42)
    oracle = run_oracle_on_fixture(fx, CFG)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    root = str(tmp_path / "snaps")
    eng1 = CrawlEngine(spark, pages, robots, CFG, work_dir=root)
    _force_upserts(eng1)
    eng1.run(seeds, max_rounds=3)
    # the crash point must actually sit on a multi-dir upsert chain
    man = SnapshotStore(root).read_manifest(3)
    assert any(len(_chain(man["tables"][t])) > 1 for t in MUT)

    eng2 = CrawlEngine(spark, pages, robots, CFG, work_dir=root)
    _force_upserts(eng2)
    eng2.resume()
    assert eng2.round == 3
    eng2.run(max_rounds=CFG.max_rounds)
    assert_match(oracle, eng2)


def test_upsert_compaction_caps_the_chain(spark, tmp_path):
    """snapshot_compact_chain bounds the dirs a reconcile unions: at
    the cap the next commit rewrites the mutable table full (single
    dir, no merge_key) and the chain restarts."""
    fx = generate_fixture(seed=42, n_pages=80, n_origins=8, n_seeds=4)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    root = str(tmp_path / "snaps")
    eng = CrawlEngine(spark, pages, robots,
                      CrawlConfig(max_path_length=4, max_path_props=3,
                                  resources_per_domain=2),
                      work_dir=root)
    _force_upserts(eng)
    eng.snapshot_compact_chain = 2
    eng.run(seeds, max_rounds=10)
    store = SnapshotStore(root)
    last = store.latest_round()
    lens = [len(_chain(store.read_manifest(r)["tables"]["resources"]))
            for r in range(last + 1)]
    assert max(lens) <= 2
    assert any(a == 2 and b == 1 for a, b in zip(lens, lens[1:])), lens
    # a compacted entry sheds its merge metadata
    compacted = next(r for r, (a, b) in
                     enumerate(zip(lens, lens[1:]), start=1)
                     if a == 2 and b == 1)
    info = store.read_manifest(compacted)["tables"]["resources"]
    assert "merge_key" not in info and "delta_lineage" not in info


def test_quiet_table_carries_forward_without_io(spark, tmp_path):
    """A commit that touched nothing in a mutable table (round 1 is
    robots-only: no fetches, so no resource status flips) re-publishes
    the previous entry untouched — zero write amplification."""
    fx = generate_fixture(seed=7, n_pages=40, n_origins=4, n_seeds=2)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    root = str(tmp_path / "snaps")
    eng = CrawlEngine(spark, pages, robots,
                      CrawlConfig(max_path_length=2), work_dir=root)
    _force_upserts(eng)
    eng.run(seeds, max_rounds=1)
    store = SnapshotStore(root)
    m0 = store.read_manifest(0)
    m1 = store.read_manifest(1)
    assert _chain(m1["tables"]["resources"]) == \
        _chain(m0["tables"]["resources"])
    # domains DID change in round 1 (robots checks) — delta committed
    assert len(_chain(m1["tables"]["domains"])) == 2


def test_default_gate_keeps_small_tables_full(spark, tmp_path):
    """Below snapshot_upsert_min_rows a mutable table keeps taking
    single-dir full rewrites — the chain's fixed per-commit and
    per-read reconcile costs only pay off once the base dwarfs the
    round's touched set."""
    fx = generate_fixture(seed=7, n_pages=40, n_origins=4, n_seeds=2)
    oracle_cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                             resources_per_domain=2, max_rounds=6)
    oracle = run_oracle_on_fixture(fx, oracle_cfg)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    root = str(tmp_path / "snaps")
    eng = CrawlEngine(spark, pages, robots, oracle_cfg, work_dir=root)
    assert eng.snapshot_upsert_min_rows > 0  # default gate engaged
    eng.run(seeds)
    assert_match(oracle, eng)
    store = SnapshotStore(root)
    for rnd in range(store.latest_round() + 1):
        man = store.read_manifest(rnd)
        for t in MUT:
            assert len(_chain(man["tables"][t])) == 1, (rnd, t)
