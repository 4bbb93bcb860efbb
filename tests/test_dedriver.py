"""De-drivered step transitions (VERDICT r2 #2): convert_to_endpoint
and start_step must never materialize a frontier-scale head set on the
driver — new endpoint rows and re-extension parents are built as
DataFrames (seqs via the distributed two-phase rank)."""

import pytest
from pyspark.sql import DataFrame

from derzis_spark.config import CrawlConfig
from derzis_spark.engine import CrawlEngine
from derzis_spark.fixtures import generate_fixture
from tests.conftest import fixture_dataframes

#: any driver collect during a step transition must be tiny
#: (seq-offset rows at most), never frontier-sized
COLLECT_CAP = 8


def _spy_collect(monkeypatch):
    calls: list[int] = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        calls.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    return calls


@pytest.mark.slow
def test_convert_to_endpoint_collects_nothing_frontier_sized(
        spark, monkeypatch):
    fx = generate_fixture(n_pages=400, n_origins=8, n_seeds=6, seed=42,
                          out_links=8)
    cfg = CrawlConfig(max_path_length=4, max_path_props=3,
                      resources_per_domain=4, max_rounds=3)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.run(seeds, max_rounds=3)
    n_active = engine.paths.filter("status = 'active'").count()
    assert n_active > 4 * COLLECT_CAP, \
        "fixture frontier too small to prove anything"
    calls = _spy_collect(monkeypatch)
    engine.convert_to_endpoint()
    assert not calls or max(calls) <= COLLECT_CAP, calls
    # the conversion really happened: endpoint rows exist for the heads
    assert engine.paths.filter(
        "status = 'active' AND seed_paths IS NOT NULL").count() \
        > 4 * COLLECT_CAP


@pytest.mark.slow
def test_extension_cascade_collects_nothing_frontier_sized(
        spark, monkeypatch):
    """The wave cascade's re-extension head set stays a DataFrame: the
    only driver collects inside _extend are dimension-sized (per-origin
    insert counters; seq prefix offsets for huge waves). The old code
    collected next_heads (the done/blank head set — frontier-scale on
    a fat round) between every pair of waves."""
    fx = generate_fixture(n_pages=2400, n_origins=30, n_seeds=30,
                          seed=42, out_links=8)
    cfg = CrawlConfig(max_path_length=4, max_path_props=3,
                      resources_per_domain=24, max_rounds=5)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)

    in_extend = {"flag": False}
    calls: list[int] = []
    orig_extend = CrawlEngine._extend
    orig_collect = DataFrame.collect

    def wrapped_extend(self, rnd, fetched_done):
        in_extend["flag"] = True
        try:
            return orig_extend(self, rnd, fetched_done)
        finally:
            in_extend["flag"] = False

    def spy(self):
        rows = orig_collect(self)
        if in_extend["flag"]:
            calls.append(len(rows))
        return rows

    monkeypatch.setattr(CrawlEngine, "_extend", wrapped_extend)
    monkeypatch.setattr(DataFrame, "collect", spy)
    engine.run(seeds, max_rounds=5)
    cap = 30 + 64  # origins + parallelism margin
    multiwave = [m for m in engine.metrics
                 if len(m.get("waves", [])) >= 2]
    assert multiwave, "fixture produced no multi-wave round"
    assert any(m["waves"][1]["n"] > cap for m in multiwave), \
        "later waves too small to prove anything"
    assert not calls or max(calls) <= cap, calls


@pytest.mark.slow
def test_start_step_passes_done_heads_as_dataframe(spark, monkeypatch):
    """The done-head set reaches the extension cascade as a DataFrame:
    with the cascade stubbed, start_step performs no frontier-sized
    driver collect (the old code collected every done-headed active
    head). max_path_props=1 in step 1 leaves paths whose extension was
    predicate-blocked but whose head got fetched via a sibling path —
    exactly the done-headed active set startNext re-extends."""
    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=42)
    cfg = CrawlConfig(max_path_length=3, max_path_props=1,
                      resources_per_domain=2, max_rounds=40)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.run(seeds, max_rounds=40)

    got: dict[str, object] = {}

    def stub_extend(rnd, fetched_done):
        got["type"] = type(fetched_done)
        got["n"] = fetched_done.count() \
            if isinstance(fetched_done, DataFrame) else len(fetched_done)
        return 0

    monkeypatch.setattr(engine, "_extend", stub_extend)
    calls = _spy_collect(monkeypatch)
    engine.start_step(config=CrawlConfig(
        max_path_length=4, max_path_props=3, resources_per_domain=2))
    assert issubclass(got["type"], DataFrame)
    assert got["n"] > 0
    assert not calls or max(calls) <= COLLECT_CAP, calls
