"""Config-space sweep: engine-vs-oracle exact match across varied
combinations of path type, blank-node handling, direction filtering,
predicate limitations, politeness budgets, redirects, and fixture
shapes — breadth coverage beyond the targeted per-feature tests."""

import pytest

from derzis_spark.config import CrawlConfig, PredLimitation
from tests.test_engine_matches_oracle import assert_match, run_both
from derzis_spark.fixtures import generate_fixture

CASES = [
    # (case id, fixture kwargs, config kwargs, rounds)
    ("dir_blank_alt",
     dict(n_pages=90, n_origins=5, n_seeds=4, seed=101, blank_rate=0.3,
          blank_subject_rate=0.7, alt_rate=0.15),
     dict(max_path_length=4, max_path_props=3, resources_per_domain=3,
          allow_blank_nodes=True, follow_direction=True), 10),
    ("predlims_require_past",
     dict(n_pages=90, n_origins=5, n_seeds=4, seed=102),
     dict(max_path_length=4, max_path_props=2, resources_per_domain=2,
          pred_limitations=(
              PredLimitation("http://example.org/pred/p1",
                             ("require-past", "require-future")),)), 12),
    ("predlims_disallow",
     dict(n_pages=90, n_origins=5, n_seeds=4, seed=103, literal_rate=0.8),
     dict(max_path_length=3, max_path_props=3, resources_per_domain=4,
          pred_limitations=(
              PredLimitation("/p[02]$/", ("disallow-future",)),
              PredLimitation("http://example.org/pred/p5",
                             ("disallow-past",)))), 10),
    # pred_vocab_limit=0 forces the above-gate DISTRIBUTED pattern
    # paths (vectorized UDFs instead of driver vocab collects) through
    # all four filter sites; outputs must stay bit-identical
    ("predlims_require_past_gate0",
     dict(n_pages=90, n_origins=5, n_seeds=4, seed=102),
     dict(max_path_length=4, max_path_props=2, resources_per_domain=2,
          pred_vocab_limit=0,
          pred_limitations=(
              PredLimitation("http://example.org/pred/p1",
                             ("require-past", "require-future")),)), 12),
    ("predlims_disallow_gate0",
     dict(n_pages=90, n_origins=5, n_seeds=4, seed=103, literal_rate=0.8),
     dict(max_path_length=3, max_path_props=3, resources_per_domain=4,
          pred_vocab_limit=0,
          pred_limitations=(
              PredLimitation("/p[02]$/", ("disallow-future",)),
              PredLimitation("http://example.org/pred/p5",
                             ("disallow-past",)))), 10),
    ("endpoint_predlims",
     dict(n_pages=90, n_origins=5, n_seeds=4, seed=107, blank_rate=0.2),
     dict(max_path_length=3, max_path_props=3, resources_per_domain=3,
          path_type="endpoint",
          pred_limitations=(
              PredLimitation("/p[13]$/", ("disallow-future",)),
              PredLimitation("http://example.org/pred/p4",
                             ("require-future",)))), 10),
    ("endpoint_predlims_gate0",
     dict(n_pages=90, n_origins=5, n_seeds=4, seed=107, blank_rate=0.2),
     dict(max_path_length=3, max_path_props=3, resources_per_domain=3,
          path_type="endpoint", pred_vocab_limit=0,
          pred_limitations=(
              PredLimitation("/p[13]$/", ("disallow-future",)),
              PredLimitation("http://example.org/pred/p4",
                             ("require-future",)))), 10),
    ("endpoint_dir_alt",
     dict(n_pages=90, n_origins=5, n_seeds=4, seed=104, alt_rate=0.2),
     dict(max_path_length=4, max_path_props=2, resources_per_domain=2,
          path_type="endpoint", follow_direction=True), 10),
    ("tight_budget_domain_cap",
     dict(n_pages=110, n_origins=8, n_seeds=5, seed=105, ghost_rate=0.12),
     dict(max_path_length=5, max_path_props=4, resources_per_domain=1,
          round_domain_limit=3), 14),
    ("endpoint_blank_lowredir",
     dict(n_pages=90, n_origins=5, n_seeds=4, seed=106, blank_rate=0.3,
          blank_subject_rate=0.8, alt_rate=0.2),
     dict(max_path_length=3, max_path_props=3, resources_per_domain=3,
          path_type="endpoint", allow_blank_nodes=True,
          max_redirects=1), 10),
]


@pytest.mark.slow
@pytest.mark.parametrize("name,fx_kw,cfg_kw,rounds",
                         CASES, ids=[c[0] for c in CASES])
def test_config_sweep_exact_match(spark, name, fx_kw, cfg_kw, rounds):
    fx = generate_fixture(**fx_kw)
    cfg = CrawlConfig(max_rounds=rounds, **cfg_kw)
    oracle, engine = run_both(spark, fx, cfg, max_rounds=rounds)
    assert len(oracle.trace) > 0
    assert_match(oracle, engine)
