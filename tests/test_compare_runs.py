"""Cross-run validator (scripts/compare_runs.py — port of
validator/src/lib/cmp-results.ts:4-72 + diff.ts): two crawls with the
same step config but different round budgets must diff exactly as the
Python oracle predicts (count deltas + triple-set difference), and
runs with different step configs must fail the precondition check."""

import pytest

from derzis_spark.config import CrawlConfig
from derzis_spark.engine import CrawlEngine
from derzis_spark.fixtures import generate_fixture
from derzis_spark.oracle import run_oracle_on_fixture, triple_key
from scripts.compare_runs import check_preconditions, compare
from tests.conftest import fixture_dataframes


CFG = CrawlConfig(max_path_length=3, max_path_props=2,
                  resources_per_domain=2, max_rounds=8)


@pytest.mark.slow
def test_compare_runs_matches_oracle_diff(spark, tmp_path):
    fx = generate_fixture(n_pages=60, n_origins=4, n_seeds=3, seed=42)
    pages, robots, seeds = fixture_dataframes(spark, fx)

    eng1 = CrawlEngine(spark, pages, robots, CFG,
                       work_dir=str(tmp_path / "run1"))
    eng1.run(seeds, max_rounds=3)
    eng2 = CrawlEngine(spark, pages, robots, CFG,
                       work_dir=str(tmp_path / "run2"))
    eng2.run(seeds, max_rounds=8)

    report = compare(str(tmp_path / "run1"), str(tmp_path / "run2"))
    assert report["preconditions_ok"], report["precondition_problems"]

    # oracle expectation: same fixture at the two budgets
    o1 = run_oracle_on_fixture(fx, CFG, max_rounds=3)
    o2 = run_oracle_on_fixture(fx, CFG, max_rounds=8)
    for table, odict1, odict2 in (
            ("resources", o1.resources, o2.resources),
            ("domains", o1.domains, o2.domains),
            ("triples", o1.triples, o2.triples)):
        got = report["counts"][table]
        assert got["run1"] == len(odict1), table
        assert got["run2"] == len(odict2), table
        assert got["delta"] == len(odict2) - len(odict1), table

    k1 = set(o1.triples.keys())
    k2 = set(o2.triples.keys())
    assert report["triples"]["only_in_run1"]["count"] == len(k1 - k2)
    assert report["triples"]["only_in_run2"]["count"] == len(k2 - k1)
    # the sorted sample rows are real triple keys from the diff
    for row in report["triples"]["only_in_run2"]["sample"]:
        assert tuple(row) in {tuple(map(str, k)) for k in (k2 - k1)}


def test_precondition_mismatch_detected():
    s1 = [{"max_path_length": 2, "max_path_props": 1,
           "seeds": ["a"], "pred_limitations": []}]
    s2_len = [{"max_path_length": 3, "max_path_props": 1,
               "seeds": ["a"], "pred_limitations": []}]
    s2_seeds = [{"max_path_length": 2, "max_path_props": 1,
                 "seeds": ["a", "b"], "pred_limitations": []}]
    ok, _ = check_preconditions(s1, s1)
    assert ok
    ok, problems = check_preconditions(s1, s2_len)
    assert not ok and "maxPathLength" in problems[0]
    ok, problems = check_preconditions(s1, s2_seeds)
    assert not ok and "seeds" in problems[0]
    ok, problems = check_preconditions(s1, s1 + s1)
    assert not ok and "number of steps" in problems[0]
