#!/usr/bin/env python
"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` plus a crawl-engine throughput run, and
print ONE JSON line::

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "crawl": {"urls": n, "sec": t, "urls_per_sec": r, "rounds": k}}

Scaling mode (north rule evidence): ``python bench.py --scaling`` runs
the identical crawl job in two subprocesses at local[8] and local[32]
on the same input and reports both throughputs + efficiency
(= (T_32/T_8) / (32/8)); see BENCH/BASELINE.md.

Crawl-only mode (used by the scaling subprocesses):
``python bench.py --crawl-only --cores N`` prints one JSON line with
the crawl stats for that parallelism.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "frontier_priority",
    "per_domain_topk",
    "seen_set_antijoin",
    "path_extension_join",
    "domains_rollup",
    "branching_factor",
    "dedup_exact",
    "minhash_lsh_buckets",
    "simhash",
    "ann_bruteforce_cosine",
    "quality_score",
    "doc_fingerprint",
]

# crawl bench workload: deterministic fixture, budgeted for few large
# rounds (the scale-correct regime: per-round volume amortizes round
# overhead, politeness still binds per domain)
CRAWL_FIXTURE = dict(n_pages=4000, n_origins=48, n_seeds=48, seed=42,
                     out_links=6)
CRAWL_CONFIG = dict(max_path_length=8, max_path_props=4,
                    resources_per_domain=64, max_rounds=40,
                    bloom_capacity=200_000)


def build(cores: int, shuffle_partitions: int):
    from derzis_spark.engine import build_session
    adaptive = os.environ.get("SPARK_GRAFT_AQE", "1") == "1"
    spark = build_session(app="derzis-bench", cores=cores,
                          shuffle_partitions=shuffle_partitions,
                          adaptive=adaptive)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_crawl(spark) -> dict:
    from derzis_spark import schemas
    from derzis_spark.config import CrawlConfig
    from derzis_spark.engine import CrawlEngine
    from derzis_spark.fixtures import generate_fixture

    fx = generate_fixture(**CRAWL_FIXTURE)
    pages = spark.createDataFrame(fx.pages_rows(), schemas.PAGES)
    pages.cache()
    pages.count()
    robots = spark.createDataFrame(fx.robots_rows(), schemas.ROBOTS)
    seeds = spark.createDataFrame([(u,) for u in fx.seeds], schemas.SEEDS)
    cfg = CrawlConfig(**CRAWL_CONFIG)
    engine = CrawlEngine(spark, pages, robots, cfg)
    t0 = time.time()
    engine.run(seeds)
    dt = time.time() - t0
    n_urls = len(engine._trace_rows)
    return {
        "urls": n_urls,
        "sec": round(dt, 2),
        "urls_per_sec": round(n_urls / dt, 2) if dt > 0 else 0.0,
        "rounds": engine.round,
    }


def run_queries(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--crawl-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = args.cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if args.scaling:
        results = {}
        for n in (8, 32):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--crawl-only", "--cores", str(n)],
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            results[n] = json.loads(proc.stdout.strip().splitlines()[-1])
        t8, t32 = results[8]["urls_per_sec"], results[32]["urls_per_sec"]
        eff = round((t32 / t8) / (32 / 8), 3) if t8 else None
        print(json.dumps({
            "metric": "crawl scaling local[8] vs local[32]",
            "local8": results[8], "local32": results[32],
            "speedup": round(t32 / t8, 3) if t8 else None,
            "efficiency": eff,
        }))
        return

    shuffle = max(8, cores)
    spark = build(cores, shuffle)
    if args.crawl_only:
        crawl = run_crawl(spark)
        print(json.dumps({"cores": cores, **crawl}))
        return

    queries = run_queries(spark, sf_dir)
    crawl = run_crawl(spark)
    total = round(sum(queries.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        pass
    print(json.dumps({
        "metric": "headline query suite + crawl throughput",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "crawl": crawl,
        "cores": cores,
    }))


if __name__ == "__main__":
    main()
