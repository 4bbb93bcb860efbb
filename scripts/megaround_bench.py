#!/usr/bin/env python
"""Ingest-volume evidence: a few FAT crawl rounds over the 600k-page
scale fixture (one seed per origin, resources_per_domain=200) — the
regime where one round fetches tens of thousands of pages and ingests
hundreds of thousands of triples/URLs. Records per-round phase timings
and final store sizes to BENCH/megaround_r{N}.json; the point is that
the only driver-side rows in the whole round are the collected
schedule entries (triples / edges / seen-set inserts / ledgers / trace
all stay distributed).

    python scripts/megaround_bench.py [--rounds 3] [--cores 16] \
        [--out BENCH/megaround_r3.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--out", default="BENCH/megaround_r3.json")
    args = ap.parse_args()

    from bench import ensure_scale_fixture
    from derzis_spark.config import CrawlConfig
    from derzis_spark.engine import CrawlEngine, build_session
    from pyspark.sql import functions as F

    fixture_dir = ensure_scale_fixture()
    spark = build_session(app="derzis-megaround", cores=args.cores,
                          shuffle_partitions=args.cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    robots = spark.read.parquet(os.path.join(fixture_dir, "robots.parquet"))
    # one seed per origin (the r2 evidence shape): first URL per origin
    seeds = (
        pages.select(
            F.regexp_extract("url", r"^(https?://[^/]+)", 1).alias("o"),
            "url")
        .groupBy("o").agg(F.min("url").alias("url")).select("url"))
    cfg = CrawlConfig(max_path_length=5, max_path_props=3,
                      resources_per_domain=200,
                      bloom_capacity=2_000_000)
    engine = CrawlEngine(spark, pages, robots, cfg)
    t0 = time.time()
    engine.run(seeds, max_rounds=args.rounds)
    dt = time.time() - t0
    out = {
        "rounds": engine.round,
        "sec": round(dt, 1),
        "triples_in_store": engine.triples.count(),
        "resources": engine.resources.count(),
        "metrics": engine.metrics,
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps(out)[:400])


if __name__ == "__main__":
    main()
