"""Iceberg-style delta snapshots: the append-only tables (triples /
trace / proc ledgers) commit only the rows added since the previous
snapshot, chaining manifest paths — commit I/O scales with the ROUND,
not the store. Existing-row rewrites (triple collision merge) force a
full write; long chains compact. All of it must be invisible to every
reader: loaded tables, resume, the cross-run validator and the oracle
match stay bit-exact."""

import pytest

from derzis_spark.config import CrawlConfig
from derzis_spark.engine import CrawlEngine
from derzis_spark.fixtures import generate_fixture
from derzis_spark.oracle import run_oracle_on_fixture
from derzis_spark.storage import SnapshotStore
from tests.conftest import fixture_dataframes
from tests.test_engine_matches_oracle import assert_match


CFG = CrawlConfig(max_path_length=3, max_path_props=2,
                  resources_per_domain=2, max_rounds=12)


def _chain(info):
    return SnapshotStore.table_paths(info)


def _inject_cross_round_collision(fx):
    """Copy one N-Triples line from a page fetched in round 2 into the
    block of a page fetched in round 3 (same seed list, politeness
    budget untouched), so round 3's MERGE finds a key already in the
    store — the rewrite regime the delta commit must fall back from."""
    from derzis_spark.functions.core import extract_ntriples_block

    probe = run_oracle_on_fixture(fx, CFG)
    by_round = {}
    for e in probe.trace:
        if e.status == "done":
            by_round.setdefault(e.round, []).append(e.url)
    idx = {u: i for i, u in enumerate(fx.urls)}

    def first_line(url):
        block = extract_ntriples_block(fx.html[idx[url]])
        return next((ln for ln in block.splitlines() if ln.strip()), None)

    donor = next(u for u in by_round[2] if first_line(u))
    target = next(u for u in by_round[3] if first_line(u))
    line = first_line(donor)
    i = idx[target]
    fx.html[i] = fx.html[i].replace(
        b"</ntriples>", b"\n" + line.encode("utf-8") + b"\n</ntriples>")


@pytest.mark.slow
def test_delta_chain_grows_and_readers_stay_exact(spark, tmp_path):
    """Both regimes in one crawl: rounds with only fresh keys append a
    delta dir; the round whose merge rewrote sources (the injected
    cross-round duplicate) falls back to a full triples write. Every
    reader surface (loaded tables, ledger sets, oracle match) is
    identical either way."""
    fx = generate_fixture(seed=1106, n_pages=60, n_origins=6, n_seeds=3)
    _inject_cross_round_collision(fx)
    oracle = run_oracle_on_fixture(fx, CFG)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    root = str(tmp_path / "snaps")
    eng = CrawlEngine(spark, pages, robots, CFG, work_dir=root)
    eng.snapshot_delta_min_rows = 0  # force deltas at fixture scale
    eng.run(seeds)
    assert_match(oracle, eng)

    store = SnapshotStore(root)
    last = store.latest_round()
    coll_rounds = {m["round"] for m in eng.metrics
                   if m.get("ingest_detail", {}).get("n_coll", 0) > 0}
    assert coll_rounds, "fixture no longer produces collisions"
    saw_delta = False
    prev_triples_rows = 0
    for rnd in range(0, last + 1):
        man = store.read_manifest(rnd)
        info = man["tables"]["triples"]
        if rnd in coll_rounds:
            # rewrite ⇒ full write that round: single fresh dir
            assert len(_chain(info)) == 1
            assert f"r{rnd:04d}" in _chain(info)[0]
        elif len(_chain(info)) > 1:
            saw_delta = True
        assert info["rows"] >= prev_triples_rows  # append-monotone
        prev_triples_rows = info["rows"]
        # per-bucket lineage stays exact across chains
        assert sum(info["partitions"].values()) == info["rows"]
    assert saw_delta, "no round took the delta path"

    # manifest row counts equal the loaded-table truth
    man = store.read_manifest(last)
    tables = store.load_tables(spark, last)
    assert man["tables"]["triples"]["rows"] == tables["triples"].count()
    assert man["tables"]["trace"]["rows"] == tables["trace"].count()
    # ledgers are merge-on-read: physical rows may exceed the distinct
    # set, the read surface dedups
    assert man["tables"]["proc_triples"]["rows"] \
        >= tables["proc_triples"].distinct().count()
    got = {tuple(r) for r in tables["proc_triples"].distinct().collect()}
    assert got == eng.proc_triples


def test_compaction_caps_the_chain(spark, tmp_path):
    """snapshot_compact_chain bounds how many dirs a reader unions:
    when the chain hits the cap the next commit rewrites the table
    full and the chain resets to one dir."""
    fx = generate_fixture(seed=42, n_pages=80, n_origins=8, n_seeds=4)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    root = str(tmp_path / "snaps")
    eng = CrawlEngine(spark, pages, robots,
                      CrawlConfig(max_path_length=4, max_path_props=3,
                                  resources_per_domain=2),
                      work_dir=root)
    eng.snapshot_compact_chain = 2
    eng.snapshot_delta_min_rows = 0
    eng.run(seeds, max_rounds=10)
    store = SnapshotStore(root)
    last = store.latest_round()
    lens = [len(_chain(store.read_manifest(r)["tables"]["trace"]))
            for r in range(0, last + 1)]
    assert max(lens) <= 2
    # at least one compaction actually reset a grown chain
    assert any(a == 2 and b == 1 for a, b in zip(lens, lens[1:])), lens


def test_small_tables_take_full_rewrites_under_the_gate(spark, tmp_path):
    """Deltas only pay off once the table dwarfs the round's additions
    (measured: forced-delta snapshots cost 112 s vs 84 s full-rewrite
    at 47k-row bench scale, BENCH/snapshot_ab_r4.json). Under the
    default ``snapshot_delta_min_rows`` gate a small growing table must
    keep taking single-dir full rewrites — no chain forms — while the
    loaded tables stay the exact logical store."""
    fx = generate_fixture(seed=42, n_pages=80, n_origins=8, n_seeds=4)
    oracle_cfg = CrawlConfig(max_path_length=4, max_path_props=3,
                             resources_per_domain=2)
    oracle = run_oracle_on_fixture(fx, oracle_cfg)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    root = str(tmp_path / "snaps")
    eng = CrawlEngine(spark, pages, robots, oracle_cfg, work_dir=root)
    assert eng.snapshot_delta_min_rows > 0  # default gate engaged
    eng.run(seeds)
    assert_match(oracle, eng)
    store = SnapshotStore(root)
    last = store.latest_round()
    grew = False
    prev_rows = 0
    for rnd in range(0, last + 1):
        info = store.read_manifest(rnd)["tables"]["triples"]
        assert len(_chain(info)) == 1, (rnd, _chain(info))
        if info["rows"] > prev_rows and prev_rows > 0:
            grew = True  # a growing round still rewrote full
        prev_rows = info["rows"]
    assert grew, "fixture produced no multi-round triple growth"


def test_unchanged_table_carries_forward_without_io(spark, tmp_path):
    """A commit in which an append-only table gained nothing (e.g. the
    robots-only first round for triples) re-publishes the previous
    paths untouched — zero write amplification for quiet tables."""
    fx = generate_fixture(seed=7, n_pages=40, n_origins=4, n_seeds=2)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    root = str(tmp_path / "snaps")
    eng = CrawlEngine(spark, pages, robots,
                      CrawlConfig(max_path_length=2), work_dir=root)
    eng.run(seeds, max_rounds=1)  # round 1 = robots checks, no fetches
    store = SnapshotStore(root)
    m0 = store.read_manifest(0)
    m1 = store.read_manifest(1)
    assert _chain(m1["tables"]["triples"]) == \
        _chain(m0["tables"]["triples"])
    assert m1["tables"]["triples"]["rows"] == 0
