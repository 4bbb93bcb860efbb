"""De-drivered driver-contract spy tests.

VERDICT r2 #2: convert_to_endpoint and start_step must never
materialize a frontier-scale head set on the driver — new endpoint
rows and re-extension parents are built as DataFrames (seqs via the
distributed two-phase rank).

VERDICT r3 #2-#4: the endpoint additive seed insert anti-joins the
(tiny) seed list instead of collecting the frontier's heads; the
robots phase merges its per-domain updates distributively (only counts
cross to the driver); new-origin insertion past ``origin_set_limit``
unions the new dimension rows distributively."""

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


def test_endpoint_seed_insert_collects_only_seed_sized(spark, monkeypatch):
    """_insert_seed_paths in endpoint mode (VERDICT r3 #2): the frontier
    head set stays distributed; only O(seed list) rows reach the driver.
    The old code collected EVERY endpoint head url to dedup 3 seeds."""
    fx = generate_fixture(n_pages=400, n_origins=8, n_seeds=6, seed=42,
                          out_links=8)
    cfg = CrawlConfig(max_path_length=4, max_path_props=3,
                      resources_per_domain=4, max_rounds=3,
                      path_type="endpoint")
    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.run(seeds, max_rounds=3)
    heads = [r["head_url"] for r in engine.paths.filter(
        "head_kind = 'url' AND status = 'active'")
        .select("head_url").limit(2 * COLLECT_CAP + 2).collect()]
    assert len(heads) > 2 * COLLECT_CAP, \
        "fixture frontier too small to prove anything"
    # two genuinely-new seeds + one that is already an endpoint head
    new_seeds = ["https://newseed-a.example.org/",
                 "https://newseed-b.example.org/", heads[0]]
    seeds2 = spark.createDataFrame([(u,) for u in new_seeds],
                                   "url string")
    n_before = engine.paths.count()
    calls = _spy_collect(monkeypatch)
    inserted = engine._insert_seed_paths(seeds2)
    assert not calls or max(calls) <= COLLECT_CAP, calls
    assert sorted(inserted) == sorted(
        u.rstrip() for u in new_seeds)  # all canonical already
    # only the two unseen seeds created endpoint rows
    assert engine.paths.count() == n_before + 2
    assert engine.paths.filter(
        engine.paths.head_url.isin(new_seeds[:2])).count() == 2


def test_phase_robots_collects_nothing_domain_sized(spark, monkeypatch):
    """_phase_robots (VERDICT r3 #3): a discovery-heavy round checking
    hundreds of unvisited domains must not collect one row per domain —
    the updates merge into ``domains`` as a DataFrame and only counts
    reach the driver."""
    n_dom = 400
    fx = generate_fixture(n_pages=n_dom, n_origins=n_dom, n_seeds=4,
                          seed=42)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2)
    pages, robots, _ = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    # one seed per origin → every domain is robots-eligible in round 1
    seeds = spark.createDataFrame(
        [(f"https://o{i}.example.org/page/{i}",) for i in range(n_dom)],
        "url string")
    engine.bootstrap(seeds)
    eligible = engine._eligible_paths()
    calls = _spy_collect(monkeypatch)
    n_checked = engine._phase_robots(1, eligible)
    assert n_checked == n_dom
    assert engine._unvisited_domains == 0
    assert not calls or max(calls) <= COLLECT_CAP, calls
    # the merge really happened: every domain left 'unvisited'
    assert engine.domains.filter("status = 'unvisited'").count() == 0
    # host_not_found robots got their E_DOMAIN_NOT_FOUND warning
    n_err = engine.domains.filter("status = 'error'").count()
    n_warned = engine.domains.filter(
        "warnings['E_DOMAIN_NOT_FOUND'] = 1").count()
    assert n_err == n_warned


def test_insert_new_urls_distributed_above_origin_gate(spark, monkeypatch):
    """_insert_new_urls past origin_set_limit (VERDICT r3 #4 / ADVICE):
    new dimension rows are unioned distributively — no per-origin rows
    on the driver even when a batch surfaces hundreds of new domains."""
    fx = generate_fixture(n_pages=60, n_origins=4, n_seeds=3, seed=42)
    cfg = CrawlConfig(origin_set_limit=0)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.bootstrap(seeds)
    n_new_origins = 300
    batch = spark.createDataFrame(
        [(f"https://disc{i}.example.org/p/{j}",)
         for i in range(n_new_origins) for j in range(2)],
        "url string")
    n_dom_before = engine.domains.count()
    unvisited_before = engine._unvisited_domains
    calls = _spy_collect(monkeypatch)
    n = engine._insert_new_urls(batch)
    assert n == 2 * n_new_origins
    assert not calls or max(calls) <= COLLECT_CAP, calls
    assert engine._known_origins is None
    assert engine.domains.count() == n_dom_before + n_new_origins
    assert engine._n_domains == n_dom_before + n_new_origins
    assert engine._unvisited_domains == unvisited_before + n_new_origins
    # inserting the same batch again is a no-op
    assert engine._insert_new_urls(batch) == 0


@pytest.mark.slow
def test_round_builds_no_derived_driver_rows(spark, monkeypatch):
    """VERDICT r4 #5 (closed in r5): the round's status/clock/warning
    merges (res_up, chg_df, warning aggregates) are DataFrame algebra
    over the trace frame — no driver loop may rebuild them as Python
    row lists. Spy on createDataFrame: every schedule-sized row list
    the round ships to the cluster must be one of the ROUTING frames
    of the collected schedule (the trace emit itself, the fetch join's
    url routing, the cache-probe/head lists) — never a derived
    update-row list (their schemas would show up here and fail)."""
    from derzis_spark import schemas
    from pyspark.sql import SparkSession

    fx = generate_fixture(n_pages=400, n_origins=8, n_seeds=6, seed=42,
                          out_links=8)
    # politeness spreads the frontier over rounds: the schedule only
    # exceeds COLLECT_CAP from round ~4 on, so run 8 rounds
    cfg = CrawlConfig(max_path_length=4, max_path_props=3,
                      resources_per_domain=4, max_rounds=8)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)

    big_calls: list[tuple[int, str]] = []
    orig = SparkSession.createDataFrame

    def spy(self, data, schema=None, **kw):
        if isinstance(data, list) and len(data) > COLLECT_CAP:
            big_calls.append((len(data), str(schema)))
        if schema is None:
            return orig(self, data, **kw)
        return orig(self, data, schema, **kw)

    monkeypatch.setattr(SparkSession, "createDataFrame", spy)
    engine.run(seeds, max_rounds=8)
    allowed = (
        str(schemas.TRACE),                     # the bounded trace emit
        "url string, origin string, rseq int",  # fetch join routing
        "url string",                           # cache-probe routing
        "source string",                        # cache-hit routing
        "head_url string",                      # cascade head routing
    )
    assert big_calls, "fixture produced no schedule-sized frames"
    bad = [c for c in big_calls if c[1] not in allowed]
    assert not bad, bad
