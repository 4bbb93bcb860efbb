"""Size-gated broadcast hints (VERDICT r2 #3): above
``cfg.broadcast_key_limit`` the triple-MERGE / cache-probe / endpoint
min-merge joins must drop their explicit broadcast hints (letting AQE
pick the join from actual sizes — a mega-round side would blow the 8 GB
broadcast hard limit) while producing the identical crawl."""

from derzis_spark.config import CrawlConfig
from derzis_spark.engine import CrawlEngine
from derzis_spark.fixtures import generate_fixture
from derzis_spark.oracle import run_oracle_on_fixture
from tests.conftest import fixture_dataframes
from tests.test_engine_matches_oracle import assert_match


def test_maybe_bcast_drops_hint_above_gate(spark):
    a = spark.range(100).selectExpr("id", "id * 2 AS v")
    b = spark.range(50).selectExpr("id")
    cfg_engine = CrawlEngine(
        spark,
        spark.createDataFrame([], "url string"),
        spark.createDataFrame([], "origin string"),
        CrawlConfig(broadcast_key_limit=64))
    under = a.join(cfg_engine._maybe_bcast(b, 50), "id")
    over = a.join(cfg_engine._maybe_bcast(b, 65), "id")
    under_plan = under._jdf.queryExecution().optimizedPlan().toString()
    over_plan = over._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" in under_plan.lower()
    assert "broadcast" not in over_plan.lower()


def test_over_threshold_crawl_exact_match(spark):
    """broadcast_key_limit=0 forces the shuffle path for EVERY gated
    join (merge collision scan, merge update, fresh-key anti-join,
    cache probe, endpoint min-merge) — the crawl must still match the
    oracle bit-for-bit."""
    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=42)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2, max_rounds=12,
                      broadcast_key_limit=0)
    oracle = run_oracle_on_fixture(fx, cfg, max_rounds=12)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.run(seeds, max_rounds=12)
    assert_match(oracle, engine)


def test_over_threshold_endpoint_crawl_exact_match(spark):
    fx = generate_fixture(n_pages=80, n_origins=5, n_seeds=3, seed=42)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2, max_rounds=10,
                      path_type="endpoint", broadcast_key_limit=0)
    oracle = run_oracle_on_fixture(fx, cfg, max_rounds=10)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.run(seeds, max_rounds=10)
    assert_match(oracle, engine)


def test_origin_set_overflow_crawl_exact_match(spark, tmp_path):
    """origin_set_limit=0 drops the driver-side known-origin set after
    the first insert: new-domain detection must switch to the
    batch-bounded anti-join (and resume must not rebuild the set) while
    producing the identical crawl."""
    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=42)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2, max_rounds=12,
                      origin_set_limit=0)
    oracle = run_oracle_on_fixture(fx, cfg, max_rounds=12)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    work = str(tmp_path / "run")
    engine = CrawlEngine(spark, pages, robots, cfg, work_dir=work)
    engine.run(seeds, max_rounds=6)
    assert engine._known_origins is None
    # resume from snapshot: counters rebuilt without the origin mirror
    resumed = CrawlEngine(spark, pages, robots, cfg, work_dir=work)
    resumed.resume()
    assert resumed._known_origins is None
    resumed.run(max_rounds=12)
    assert_match(oracle, resumed)


def test_over_threshold_endpoint_blank_crawl_exact_match(spark):
    """gate=0 with blank nodes on: the endpoint blank-chain probe's
    candidate set must take the shuffle join (its broadcast is gated on
    the counted candidate size) and still match the oracle."""
    fx = generate_fixture(n_pages=80, n_origins=5, n_seeds=3, seed=106,
                          blank_rate=0.3, blank_subject_rate=0.8)
    cfg = CrawlConfig(max_path_length=3, max_path_props=3,
                      resources_per_domain=3, max_rounds=8,
                      path_type="endpoint", allow_blank_nodes=True,
                      broadcast_key_limit=0)
    oracle = run_oracle_on_fixture(fx, cfg, max_rounds=8)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.run(seeds, max_rounds=8)
    assert_match(oracle, engine)


def test_over_threshold_wave_crawl_exact_match(spark):
    """wave_broadcast_limit=0 forces every cascade wave onto the
    shuffle-join path (the mega-wave regime) — the crawl must still
    match the oracle bit-for-bit."""
    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=42)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2, max_rounds=12,
                      wave_broadcast_limit=0)
    oracle = run_oracle_on_fixture(fx, cfg, max_rounds=12)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.run(seeds, max_rounds=12)
    assert_match(oracle, engine)


def test_wave_done_probe_reuses_store_partitioning(spark, monkeypatch):
    """At wave gate 0 every re-extension wave's done probe (heads ∩
    done resources) is folded LAZILY into the next wave's candidate
    plan (no dedicated probe job since the lazy-probe change), and
    there it must read the once-per-round hash-partitioned done_res
    cache instead of re-shuffling the store-sized resources side per
    wave: the probe's done leg is a column-pruned
    ``InMemoryTableScan [head_url#…]`` over the REPARTITION_BY_NUM
    cache, and the whole re-extension plan carries exactly THREE
    demand-driven exchanges — all wave-sized head_url sides (outer
    semi left + right, inner semi probe side). A regression that
    joins the raw resources view re-adds a fourth ENSURE_REQUIREMENTS
    exchange on the (store-sized) done side."""
    plans = []
    orig = CrawlEngine._extend_wave

    def spy(self, rnd, parents, ends, bf, n_parents, n_bf=0):
        df = orig(self, rnd, parents, ends, bf, n_parents, n_bf)
        plans.append(df._jdf.queryExecution().executedPlan().toString())
        return df

    monkeypatch.setattr(CrawlEngine, "_extend_wave", spy)
    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=42)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2, max_rounds=6,
                      wave_broadcast_limit=0)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        engine.run(seeds, max_rounds=6)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    probes = [p for p in plans if "LeftSemi" in p]
    assert probes, "no re-extension wave (with inlined done probe) ran"
    for p in probes:
        # the done leg is a single-column read of the hashed cache
        assert "InMemoryTableScan [head_url#" in p, p[:2000]
        # both round-sized caches (ends + done) are hash-partitioned
        assert p.count("REPARTITION_BY_NUM") >= 2, p[:2000]
        n_ens = p.count("ENSURE_REQUIREMENTS")
        assert n_ens == 3, \
            f"expected 3 wave-sized exchanges, got {n_ens}:\n{p[:2000]}"


def test_wave_dedup_reuses_join_partitioning(spark, monkeypatch):
    """On the forced-shuffle path the wave candidate plan must carry
    only wave-sized demand-driven (ENSURE_REQUIREMENTS) exchanges:
    the edge view is cached hash-partitioned on the join key (one
    REPARTITION_BY_NUM per round, inside InMemoryRelation, so
    mega-waves never re-shuffle the store-sized side), and the child
    dedup's grouping keys lead with the join key p_head, so the
    aggregation's clustering requirement is satisfied by the join's
    hashpartitioning(p_head) output and the fat child rows
    (nodes/predicates arrays) never reshuffle. Frontier waves carry
    exactly ONE such exchange (the parents side); re-extension waves
    carry THREE (the lazily-inlined done probe's wave-sized head_url
    sides — see test_wave_done_probe_reuses_store_partitioning),
    whose semi output partitioning feeds the cand join with no
    further parents exchange. Regressions re-add an exchange (ends
    side, done side, or between join and agg)."""
    plans = []
    orig = CrawlEngine._extend_wave

    def spy(self, rnd, parents, ends, bf, n_parents, n_bf=0):
        df = orig(self, rnd, parents, ends, bf, n_parents, n_bf)
        # capture BEFORE the caller caches it (caching rewrites the
        # physical plan onto InMemoryRelation)
        plans.append(df._jdf.queryExecution().executedPlan().toString())
        return df

    monkeypatch.setattr(CrawlEngine, "_extend_wave", spy)
    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=42)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2, max_rounds=6,
                      wave_broadcast_limit=0)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    # dropping the hint is not enough at test scale: statistics still
    # let Catalyst broadcast the tiny sides, which is not the mega-wave
    # plan under test — force the genuine shuffle join
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        engine.run(seeds, max_rounds=6)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert plans, "no cascade wave ran"
    assert any("LeftSemi" not in p for p in plans), "no frontier wave"
    for p in plans:
        # the cand join itself must shuffle-join under the forced
        # config — a BroadcastExchange ABOVE the caches would mean a
        # hint bypassed the gate. (The plan TEXT still contains
        # broadcast nodes inside InMemoryTableScan sections: cached
        # lineage of earlier round updates, printed but not executed
        # per wave — so assert on the join node, not substring absence)
        assert "SortMergeJoin [p_head#" in p, p[:2000]
        n_ens = p.count("ENSURE_REQUIREMENTS")
        expected = 3 if "LeftSemi" in p else 1
        assert n_ens == expected, \
            f"expected {expected} demand-driven exchanges, got " \
            f"{n_ens}:\n{p[:2000]}"
        # the ends side reads the per-round hash-partitioned cache:
        # its one repartition prints inside the InMemoryRelation
        assert p.count("REPARTITION_BY_NUM") >= 1, p[:2000]


def test_schedule_topk_plans_as_window_group_limit(spark):
    """Mega-domain skew guard: the per-domain budget
    (row_number ≤ resources_per_domain over hash(origin) partitions,
    engine `_phase_schedule`) must plan as WindowGroupLimit
    Partial+Final — the Partial keeps at most k rows PER ORIGIN PER
    MAP PARTITION before the shuffle, so a 10^8-URL mega-domain sends
    O(k × map tasks) rows to the one reducer that owns its hash
    instead of its whole eligible set. Regressions that disable the
    pushdown (a second window function over the same spec, a
    non-row_number rank, a filter moved off the rank column) would
    silently reintroduce single-task domain skew; this pins the
    executed round plan, not a synthetic one."""
    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=42)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2, max_rounds=3)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.run(seeds, max_rounds=3)
    gate = engine._last_schedule_df
    assert gate is not None, "no schedule ran"
    plan = gate._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
    assert "Partial" in plan and "Final" in plan, plan[:2000]
    # both phases must belong to the group-limit, not another operator
    wgl = [l for l in plan.splitlines() if "WindowGroupLimit" in l]
    assert any("Partial" in l for l in wgl), plan[:2000]
    assert any("Final" in l for l in wgl), plan[:2000]
