#!/usr/bin/env python
"""spark-submit entry point for the crawl engine (north rule: "runs via
spark-submit --py-files on a multi-executor cluster").

Typical invocation::

    python scripts/package.py                       # builds dist/derzis_spark.zip
    spark-submit --master local[8] \
        --py-files dist/derzis_spark.zip \
        scripts/submit_crawl.py --pages-dir /path/to/fixture \
        --max-rounds 5 --out /tmp/crawl_out

On a real cluster only --master (and executor sizing) changes: the
zip ships the package to every executor's python workers, the pages
fixture dir is any parquet path (the Iceberg pages table stand-in),
and --work-dir enables snapshot commits for deterministic resume.

Prints ONE JSON line: rounds, URLs fetched, throughput, and the
per-round metrics (including per-phase seconds).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-dir", required=True,
                    help="dir with pages.parquet / robots.parquet / "
                         "seeds.parquet (fixtures.write_fixture_parquet)")
    ap.add_argument("--max-rounds", type=int, default=10)
    ap.add_argument("--max-path-length", type=int, default=3)
    ap.add_argument("--max-path-props", type=int, default=2)
    ap.add_argument("--resources-per-domain", type=int, default=2)
    ap.add_argument("--work-dir", default=None,
                    help="snapshot-store root (enables commit + resume)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest snapshot in --work-dir")
    ap.add_argument("--out", default=None,
                    help="optional parquet output dir for the trace")
    args = ap.parse_args()

    # spark-submit provides the session config (master, executors,
    # --py-files); we only claim it
    spark = SparkSession.builder.appName("derzis-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from derzis_spark.config import CrawlConfig
    from derzis_spark.engine import CrawlEngine

    pages = spark.read.parquet(f"{args.pages_dir}/pages.parquet")
    robots = spark.read.parquet(f"{args.pages_dir}/robots.parquet")
    seeds = spark.read.parquet(f"{args.pages_dir}/seeds.parquet")
    cfg = CrawlConfig(
        max_path_length=args.max_path_length,
        max_path_props=args.max_path_props,
        resources_per_domain=args.resources_per_domain,
        max_rounds=args.max_rounds,
    )
    engine = CrawlEngine(spark, pages, robots, cfg,
                         work_dir=args.work_dir)
    t0 = time.time()
    if args.resume:
        engine.resume()
        engine.run(max_rounds=args.max_rounds)
    else:
        engine.run(seeds, args.max_rounds)
    dt = time.time() - t0
    trace = engine.trace
    if args.out:
        trace.write.mode("overwrite").parquet(args.out)
    n = trace.count()
    print(json.dumps({
        "rounds": engine.round,
        "urls": n,
        "sec": round(dt, 2),
        "urls_per_sec": round(n / dt, 2) if dt > 0 else 0.0,
        "metrics": engine.metrics,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
