"""Seed-list edge cases, engine ≡ oracle (Resource.ts:306-331 seed
insertion semantics): invalid URLs drop, duplicates and non-canonical
variants collapse to one resource with first-occurrence seq order, and
an empty seed list is a clean zero-round no-op — the full-state
`assert_match` (trace, seen-set, triples, frontier, domains, ledgers)
must hold under all of it."""

import pytest

from derzis_spark.config import CrawlConfig
from derzis_spark.engine import CrawlEngine
from derzis_spark.fixtures import generate_fixture
from derzis_spark.oracle import build_oracle_for_fixture
from derzis_spark import schemas
from tests.conftest import fixture_dataframes
from tests.test_engine_matches_oracle import assert_match


@pytest.mark.slow
def test_garbage_duplicate_and_variant_seeds_match(spark):
    fx = generate_fixture(n_pages=100, n_origins=6, n_seeds=3, seed=23)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2, max_rounds=10)
    s0, s1, s2 = fx.seeds[0], fx.seeds[1], fx.seeds[2]
    seeds = [
        s0,
        "not a url at all",            # invalid → dropped
        s0,                            # exact duplicate → collapsed
        s1 + "#frag",                  # fragment strips to seed 1
        "",                            # empty → dropped
        "http://",                     # hostless → dropped
        "http://ghost.invalid/x",      # valid but unfetchable (404 path)
        s1,                            # dup of the canonicalized variant
        s2,
    ]

    fx.seeds = list(seeds)  # oracle bootstraps from fx.seeds
    ora = build_oracle_for_fixture(fx, cfg)
    res_o = ora.run(max_rounds=10)

    pages, robots, _ = fixture_dataframes(spark, fx)
    seeds_df = spark.createDataFrame([(u,) for u in seeds], schemas.SEEDS)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.run(seeds_df, max_rounds=10)

    assert res_o.rounds == engine.round
    assert_match(res_o, engine)
    # the three distinct valid fixture seeds plus the ghost must be the
    # only seeds that produced length-1 paths, in first-occurrence
    # seq order
    l1 = sorted((r["seq"], r["seed"]) for r in engine.paths.collect()
                if r["length"] == 1)
    assert [s for _, s in l1[:4]] == [
        s0, s1, "http://ghost.invalid/x", s2]


def test_empty_seed_list_is_a_clean_noop(spark):
    fx = generate_fixture(n_pages=40, n_origins=4, n_seeds=2, seed=7)
    cfg = CrawlConfig(max_path_length=3, max_path_props=2, max_rounds=5)

    fx.seeds = []
    ora = build_oracle_for_fixture(fx, cfg)
    res_o = ora.run(max_rounds=5)

    pages, robots, _ = fixture_dataframes(spark, fx)
    empty = spark.createDataFrame([], schemas.SEEDS)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.run(empty, max_rounds=5)

    assert res_o.rounds == engine.round == 0
    assert engine.trace.count() == 0
    assert engine.resources.count() == 0
    assert_match(res_o, engine)
