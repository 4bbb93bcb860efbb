"""North-rule deployment path: the engine must run via
``spark-submit --py-files derzis_spark.zip`` (BASELINE.json north_rule)
— executors import the package from the shipped zip, NOT from the
repo checkout. The test runs the real spark-submit binary from a
temp cwd with the repo stripped from PYTHONPATH, then checks the
submitted run's trace equals the in-process oracle's."""

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH")


@pytest.mark.slow
def test_spark_submit_py_files_crawl():
    from derzis_spark.config import CrawlConfig
    from derzis_spark.fixtures import generate_fixture, write_fixture_parquet
    from derzis_spark.oracle import run_oracle_on_fixture

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import package as pkg_builder

    tmp = tempfile.mkdtemp(prefix="submit_test_")
    fixture_dir = os.path.join(tmp, "fixture")
    fx = generate_fixture(n_pages=60, n_origins=4, n_seeds=3, seed=5)
    write_fixture_parquet(fx, fixture_dir)
    zip_path = pkg_builder.build(os.path.join(tmp, "derzis_spark.zip"))

    # deterministic artifact: rebuilding yields identical bytes
    zip2 = pkg_builder.build(os.path.join(tmp, "derzis_spark2.zip"))
    with open(zip_path, "rb") as a, open(zip2, "rb") as b:
        assert a.read() == b.read()

    out_dir = os.path.join(tmp, "trace_out")
    env = dict(os.environ)
    # the shipped zip must be the ONLY way executors see the package
    env["PYTHONPATH"] = zip_path
    env.pop("SPARK_HOME", None)
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_crawl.py"),
         "--pages-dir", fixture_dir, "--max-rounds", "6",
         "--out", out_dir],
        capture_output=True, text=True, timeout=420, cwd=tmp, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["urls"] > 0 and result["rounds"] > 0

    # the submitted run must equal the oracle trace exactly
    cfg = CrawlConfig(max_path_length=3, max_path_props=2,
                      resources_per_domain=2, max_rounds=6)
    oracle = run_oracle_on_fixture(fx, cfg, max_rounds=6)
    import duckdb
    rows = duckdb.sql(
        f"SELECT round, seq, url, origin, status FROM '{out_dir}/*.parquet' "
        "ORDER BY round, seq").fetchall()
    expected = [(e.round, e.seq, e.url, e.origin, e.status)
                for e in oracle.trace]
    assert rows == expected
    shutil.rmtree(tmp, ignore_errors=True)
