"""The north-rule gate: the Spark engine must reproduce the oracle's
crawl trace, seen-set, triple-set, and final frontier bit-for-bit
(BASELINE.json: "matching the reference's crawl ordering and URL-seen
set under the same seed list + politeness budget")."""

import pytest

from derzis_spark.config import CrawlConfig
from derzis_spark.engine import CrawlEngine
from derzis_spark.fixtures import generate_fixture
from derzis_spark.oracle import run_oracle_on_fixture
from tests.conftest import fixture_dataframes


def oracle_trace_tuples(result):
    return [(e.round, e.seq, e.url, e.origin, e.status) for e in result.trace]


def engine_trace_tuples(trace_df):
    rows = trace_df.orderBy("round", "seq").collect()
    return [(r["round"], r["seq"], r["url"], r["origin"], r["status"])
            for r in rows]


def run_both(spark, fx, cfg, max_rounds=None):
    oracle = run_oracle_on_fixture(fx, cfg, max_rounds)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.run(seeds, max_rounds)
    return oracle, engine


def assert_match(oracle, engine):
    # 1. exact crawl order
    assert engine_trace_tuples(engine.trace) == oracle_trace_tuples(oracle)
    # 2. final URL-seen set (url, origin, status) + crawlId stamps
    eng_res = {
        (r["url"], r["origin"], r["status"],
         r["crawl_round"], r["crawl_counter"])
        for r in engine.resources.collect()
    }
    ora_res = {
        (u, v["origin"], v["status"],
         v.get("crawl_round"), v.get("crawl_counter"))
        for u, v in oracle.resources.items()
    }
    assert eng_res == ora_res
    # 3. triple store with source sets
    eng_tri = {
        (r["subject"], r["predicate"], r["object_kind"], r["object_value"],
         r["object_datatype"] or "", r["object_language"] or "",
         frozenset(r["sources"]))
        for r in engine.triples.collect()
    }
    ora_tri = {
        k + (frozenset(v["sources"]),) for k, v in oracle.triples.items()
    }
    assert eng_tri == ora_tri
    # 4. final frontier: every path with identical identity + seq
    eng_paths = {
        (r["seq"], r["seed"], r["head_kind"], r["head_key"],
         tuple(r["nodes"]), tuple(r["predicates"]), r["length"],
         r["status"], r["created_round"],
         tuple(sorted(r["seed_paths"].items()))
         if r["seed_paths"] is not None else ())
        for r in engine.paths.collect()
    }
    ora_paths = {
        (p.seq, p.seed, p.head_kind, p.head_key, p.nodes, p.predicates,
         p.effective_length, p.status, p.created_round, p.seed_paths)
        for p in oracle.paths
    }
    assert eng_paths == ora_paths
    # 5. domain politeness state + warning counters / last-10 ring
    eng_dom = {
        (r["origin"], r["status"], r["crawl_delay"], r["next_allowed"],
         tuple(sorted(r["warnings"].items())), tuple(r["last_warnings"]))
        for r in engine.domains.collect()
    }
    ora_dom = {
        (d.origin, d.status, d.crawl_delay, d.next_allowed,
         tuple(sorted(d.warnings.items())), tuple(d.last_warnings))
        for d in oracle.domains.values()
    }
    assert eng_dom == ora_dom
    # 6. processTriples ledger (triples that extended a path)
    assert engine.proc_triples == oracle.proc_triples
    # 7. processDoneResources (sources of those, at extension time)
    assert engine.proc_done_resources == oracle.proc_done_resources


@pytest.mark.slow
def test_small_crawl_exact_match(spark):
    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=42)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2, max_rounds=40)
    oracle, engine = run_both(spark, fx, cfg)
    assert oracle.rounds == engine.round
    assert_match(oracle, engine)


@pytest.mark.slow
def test_budget_and_deeper_paths_match(spark):
    fx = generate_fixture(n_pages=150, n_origins=8, n_seeds=5, seed=7)
    cfg = CrawlConfig(max_path_length=4, max_path_props=2,
                      resources_per_domain=1, max_rounds=12)
    oracle, engine = run_both(spark, fx, cfg, max_rounds=12)
    assert_match(oracle, engine)


@pytest.mark.slow
def test_domain_limit_match(spark):
    fx = generate_fixture(n_pages=100, n_origins=6, n_seeds=4, seed=3)
    cfg = CrawlConfig(max_path_length=3, max_path_props=1,
                      resources_per_domain=2, round_domain_limit=2,
                      max_rounds=15)
    oracle, engine = run_both(spark, fx, cfg, max_rounds=15)
    assert_match(oracle, engine)


@pytest.mark.slow
def test_blank_node_chaining_match(spark):
    """allow_blank_nodes=True: blank objects are namespaced per source
    page (Worker.ts:63-70) and blank-headed paths chain through a
    second extension hop within the round (blank-node-utils.ts:21-38);
    the engine's wave cascade must reproduce the oracle exactly."""
    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=42,
                          blank_rate=0.3)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2, max_rounds=40,
                      allow_blank_nodes=True)
    oracle, engine = run_both(spark, fx, cfg)
    assert oracle.rounds == engine.round
    assert_match(oracle, engine)
    # the fixture must actually exercise blank nodes for this to count
    n_blank = engine.triples.filter("object_kind = 'blank'").count()
    assert n_blank > 0


@pytest.mark.slow
def test_reset_errors_then_continue_match(spark):
    """resetErrors (Process.ts:562-664): errored resources/domains
    revert and the crawl continues; engine and oracle must agree on the
    extended trace and final state. Seen-set membership never shrinks,
    so the Bloom pre-pass stays exact through the reset."""
    from derzis_spark.oracle import build_oracle_for_fixture

    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=42,
                          ghost_rate=0.15)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2, max_rounds=12)

    ora = build_oracle_for_fixture(fx, cfg)
    ora.run(max_rounds=12)
    ora.reset_errored_states()
    res_o = ora.run(max_rounds=20)

    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.run(seeds, max_rounds=12)
    engine.reset_errored_states()
    engine.run(max_rounds=20)

    assert_match(res_o, engine)


@pytest.mark.slow
def test_endpoint_mode_match(spark):
    """Endpoint path type (EndpointPath.ts): one path per head, merged
    per-seed min distances, priority by shortestPathLength — engine and
    oracle must agree on trace, seen-set, and the endpoint frontier."""
    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=42)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2, max_rounds=40,
                      path_type="endpoint")
    oracle, engine = run_both(spark, fx, cfg)
    assert oracle.rounds == engine.round
    assert_match(oracle, engine)
    # head uniqueness invariant for endpoint url paths
    heads = [r["head_url"] for r in engine.paths.filter(
        "head_kind = 'url'").collect()]
    assert len(heads) == len(set(heads))


@pytest.mark.slow
def test_endpoint_mode_with_direction_match(spark):
    fx = generate_fixture(n_pages=100, n_origins=5, n_seeds=4, seed=9)
    cfg = CrawlConfig(max_path_length=4, max_path_props=2,
                      resources_per_domain=2, max_rounds=20,
                      path_type="endpoint", follow_direction=True)
    oracle, engine = run_both(spark, fx, cfg, max_rounds=20)
    assert_match(oracle, engine)


@pytest.mark.slow
def test_convert_to_endpoint_then_continue_match(spark):
    """convertToEndpointPaths (process-paths.ts:1640-1716): after some
    traversal rounds, convert the frontier to endpoint paths (spl = node
    count, seedPaths={seed: length}, min-merged by head) and continue
    crawling under endpoint semantics; engine and oracle must agree on
    the whole extended state."""
    from derzis_spark.oracle import build_oracle_for_fixture

    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=42)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2, max_rounds=3)

    ora = build_oracle_for_fixture(fx, cfg)
    ora.run(max_rounds=3)
    ora.convert_to_endpoint()
    res_o = ora.run(max_rounds=40)

    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.run(seeds, max_rounds=3)
    engine.convert_to_endpoint()
    engine.run(max_rounds=40)

    assert_match(res_o, engine)
    # conversion leaves no active traversal rows
    n_trav = engine.paths.filter(
        "status = 'active' AND seed_paths IS NULL").count()
    assert n_trav == 0


@pytest.mark.slow
def test_endpoint_mode_with_blank_nodes_match(spark):
    """Endpoint mode + allow_blank_nodes: blank 2-hop chaining at
    unincremented distance (EndpointPath.ts:270-337, 'blank node hop
    doesn't count'); engine and oracle must agree exactly."""
    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=42,
                          blank_rate=0.3)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2, max_rounds=40,
                      path_type="endpoint", allow_blank_nodes=True)
    oracle, engine = run_both(spark, fx, cfg)
    assert_match(oracle, engine)
    assert engine.triples.filter("object_kind = 'blank'").count() > 0


@pytest.mark.slow
def test_cross_source_triple_collision_match(spark):
    """The same (s,p,o) extracted from MULTIPLE pages must merge its
    source set ($addToSet sources, Triple.ts:79-120) — exercises the
    engine's collision-merge path in _merge_triples (fresh keys append;
    colliding keys take the broadcast MERGE join)."""
    fx = generate_fixture(n_pages=80, n_origins=5, n_seeds=4, seed=13)
    # inject one identical triple into several pages' payloads: the
    # common subject is a third URL, so the triple collides across
    # sources when the later pages are fetched
    extra = (b"\n<https://o1.example.org/page/1> "
             b"<http://example.org/pred/p0> "
             b"<https://o2.example.org/page/2> .")
    patched = 0
    seed_set = set(fx.seeds)
    for i, u in enumerate(fx.urls):
        if u in seed_set:
            fx.html[i] = fx.html[i].replace(
                b"</ntriples>", extra + b"</ntriples>", 1)
            patched += 1
    assert patched >= 3
    cfg = CrawlConfig(max_path_length=4, max_path_props=3,
                      resources_per_domain=4, max_rounds=20)
    oracle, engine = run_both(spark, fx, cfg, max_rounds=20)
    # the injected triple must exist with >1 source in the oracle
    multi = [v for v in oracle.triples.values() if len(v["sources"]) > 1]
    assert multi, "fixture produced no cross-source collision"
    assert_match(oracle, engine)


@pytest.mark.slow
def test_parallel_seq_rank_matches(spark):
    """The two-phase range-partitioned seq rank (the 10^10-scale path
    for wave seq assignment) must produce exactly the same dense seq
    ids — and therefore the same trace/frontier — as the single-window
    path. Forced via seq_rank_threshold=0."""
    from derzis_spark.engine import CrawlEngine
    fx = generate_fixture(n_pages=100, n_origins=6, n_seeds=4, seed=21)
    cfg = CrawlConfig(max_path_length=4, max_path_props=3,
                      resources_per_domain=4, max_rounds=15)
    oracle = run_oracle_on_fixture(fx, cfg, max_rounds=15)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.seq_rank_threshold = 0  # force the parallel rank every wave
    engine.run(seeds, 15)
    assert_match(oracle, engine)


@pytest.mark.slow
def test_blank_chaining_with_outgoing_edges_traversal(spark):
    """Blank nodes WITH outgoing triples (blank_subject_rate) force
    real 2-hop chaining (blank-node-utils.ts:21-38) — earlier fixtures
    had object-only blanks, so the chain branch never fired."""
    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=42,
                          blank_rate=0.4, blank_subject_rate=0.9)
    cfg = CrawlConfig(max_path_length=3, max_path_props=3,
                      resources_per_domain=3, allow_blank_nodes=True,
                      max_rounds=20)
    oracle, engine = run_both(spark, fx, cfg, max_rounds=20)
    # chaining must actually occur
    assert any(k[0].startswith("_:") for k in oracle.proc_triples)
    assert_match(oracle, engine)


@pytest.mark.slow
def test_blank_chaining_with_outgoing_edges_endpoint(spark):
    """Endpoint-mode blank 2-hop chaining at unincremented distance
    (EndpointPath.ts:270-337) with real outgoing edges — regression
    test for the dead blank branch (blanks were filtered out of the
    candidate set before the chain could read them)."""
    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=42,
                          blank_rate=0.4, blank_subject_rate=0.9)
    cfg = CrawlConfig(max_path_length=3, max_path_props=3,
                      resources_per_domain=3, allow_blank_nodes=True,
                      path_type="endpoint", max_rounds=20)
    oracle, engine = run_both(spark, fx, cfg, max_rounds=20)
    assert any(k[0].startswith("_:") for k in oracle.proc_triples)
    assert_match(oracle, engine)


@pytest.mark.slow
def test_multi_step_raised_limits_and_new_seeds_match(spark):
    """Process.startNext (Process.ts:412-493): a second step with
    raised path limits re-extends done-headed active paths under the
    new bounds and inserts additional seeds; engine and oracle must
    agree on the whole two-step trace and final state."""
    from derzis_spark.oracle import build_oracle_for_fixture

    fx = generate_fixture(n_pages=140, n_origins=7, n_seeds=3, seed=31)
    cfg1 = CrawlConfig(max_path_length=2, max_path_props=1,
                       resources_per_domain=2, max_rounds=8)
    cfg2 = CrawlConfig(max_path_length=4, max_path_props=3,
                       resources_per_domain=3, max_rounds=10)
    # step-2 seeds: two fresh pages + one seed repeated from step 1
    new_seeds = [fx.urls[77], fx.urls[111], fx.seeds[0]]

    ora = build_oracle_for_fixture(fx, cfg1)
    ora.run(max_rounds=8)
    ora.start_step(seeds=new_seeds, config=cfg2)
    res_o = ora.run(max_rounds=18)

    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg1)
    engine.run(seeds, max_rounds=8)
    seeds2 = spark.createDataFrame([(u,) for u in new_seeds],
                                   "url string")
    engine.start_step(seeds=seeds2, config=cfg2)
    engine.run(max_rounds=18)

    assert res_o.rounds == engine.round
    assert_match(res_o, engine)
    # the repeated traversal seed must have created a duplicate
    # length-1 path (Resource.insertSeeds creates unconditionally)
    dup = sum(1 for r in engine.paths.collect()
              if r["seed"] == new_seeds[2] and r["length"] == 1)
    assert dup >= 2


@pytest.mark.slow
def test_multi_step_endpoint_seed_dedup_match(spark):
    """Endpoint-mode step seeds take the $setOnInsert path
    (Resource.ts:345-420): a seed whose head already has an endpoint
    path must NOT create a second one."""
    from derzis_spark.oracle import build_oracle_for_fixture

    fx = generate_fixture(n_pages=100, n_origins=5, n_seeds=3, seed=19)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2, max_rounds=8,
                      path_type="endpoint")
    new_seeds = [fx.urls[50], fx.seeds[0]]

    ora = build_oracle_for_fixture(fx, cfg)
    ora.run(max_rounds=8)
    ora.start_step(seeds=new_seeds)
    res_o = ora.run(max_rounds=16)

    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.run(seeds, max_rounds=8)
    engine.start_step(seeds=spark.createDataFrame(
        [(u,) for u in new_seeds], "url string"))
    engine.run(max_rounds=16)

    assert_match(res_o, engine)
    heads = [r["head_url"] for r in engine.paths.filter(
        "head_kind = 'url'").collect()]
    assert len(heads) == len(set(heads))


@pytest.mark.slow
def test_large_fixture_exact_match(spark):
    """Scale-shape regression: ~1000 pages / 25 rounds / ~50k frontier
    paths with redirects + blank chaining on — exercises AQE replans,
    multi-partition windows, and the parallel wave machinery that tiny
    fixtures never reach, while still matching the oracle bit-for-bit."""
    fx = generate_fixture(n_pages=1000, n_origins=24, n_seeds=30, seed=77,
                          out_links=6, alt_rate=0.1, blank_rate=0.2,
                          blank_subject_rate=0.5)
    cfg = CrawlConfig(max_path_length=6, max_path_props=5,
                      resources_per_domain=12, allow_blank_nodes=True,
                      max_rounds=25)
    oracle, engine = run_both(spark, fx, cfg, max_rounds=25)
    assert len(oracle.trace) > 500
    assert_match(oracle, engine)


@pytest.mark.slow
def test_round_budget_cap_match(spark):
    """Binding round_budget_cap (VERDICT r1 #9): the cap is a parallel
    top-k applied before the schedule collect; engine and oracle agree
    on the capped trace, and no round schedules more than the cap."""
    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=11)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=3, round_budget_cap=4,
                      max_rounds=15)
    oracle, engine = run_both(spark, fx, cfg, max_rounds=15)
    assert_match(oracle, engine)
    per_round: dict[int, int] = {}
    for rnd, *_ in engine_trace_tuples(engine.trace):
        per_round[rnd] = per_round.get(rnd, 0) + 1
    assert max(per_round.values()) <= 4
    assert any(v == 4 for v in per_round.values()), \
        "cap never binds — weaken the fixture or lower the cap"


@pytest.mark.slow
def test_triple_cache_fetch_skip_match(spark):
    """Re-crawl workload (Worker.ts:340-379): a done URL that is
    already a triple source, flipped back to unvisited with its path
    resurrected, re-completes via the triple cache — no pages fetch —
    identically in engine and oracle, leaving the store unchanged."""
    from pyspark.sql import functions as F
    from derzis_spark.oracle import build_oracle_for_fixture

    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=42)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2)
    oracle = build_oracle_for_fixture(fx, cfg)
    oracle.run(3)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.run(seeds, max_rounds=3)

    # pick a deterministic re-crawl target: done + a triple source +
    # has a deleted path to resurrect
    candidates = sorted(
        u for u, v in oracle.resources.items()
        if v["status"] == "done"
        and any(u in rec["sources"] for rec in oracle.triples.values())
        and any(p.head_url == u and p.status == "deleted"
                for p in oracle.paths))
    assert candidates, "fixture produced no re-crawlable source URL"
    url = candidates[0]
    target_seq = min(p.seq for p in oracle.paths
                     if p.head_url == url and p.status == "deleted")
    oracle.resources[url]["status"] = "unvisited"
    for p in oracle.paths:
        if p.seq == target_seq:
            p.status = "active"
    engine.resources = engine.resources.withColumn(
        "status", F.when(F.col("url") == url, F.lit("unvisited"))
        .otherwise(F.col("status")))
    engine.paths = engine.paths.withColumn(
        "status", F.when(F.col("seq") == target_seq, F.lit("active"))
        .otherwise(F.col("status")))

    result = oracle.run(6)
    engine.run(max_rounds=6)
    assert_match(result, engine)
    # the re-crawl round completed the URL from the cache
    recrawl = [t for t in engine_trace_tuples(engine.trace)
               if t[2] == url and t[0] > 3]
    assert recrawl and recrawl[-1][4] == "done"
