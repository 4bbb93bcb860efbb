#!/usr/bin/env python
"""Mega-domain skew evidence for the schedule's per-domain top-k
(BENCH/BASELINE.md §0.3).

The schedule ranks eligible URLs per origin (`row_number() over
hash(origin) ≤ resources_per_domain`, engine `_phase_schedule`). At
10^10-URL scale a mega-domain concentrates a huge slice of the
frontier in ONE window partition; the plan survives only because
Spark rewrites the rank-filter into WindowGroupLimit Partial+Final —
a map-side top-k per origin BEFORE the shuffle, so the mega-domain's
reducer receives O(k × map tasks) rows instead of the domain's whole
eligible set (pinned on the round plan by
tests/test_broadcast_gate.py::test_schedule_topk_plans_as_window_group_limit).

This bench measures the same shape three ways on identical row
counts: uniform origins, one 90%-mega-domain, and the mega-domain
with the pushdown DISABLED (`windowGroupLimitThreshold=-1` — the
counterfactual plan every naive per-domain window gets). Alternating
interleaved repeats, medians reported.

    python scripts/skew_bench.py [--rows 4000000] [--cores 32] \
        [--repeat 3] [--out BENCH/skew_r4.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESH_CONF = "spark.sql.optimizer.windowGroupLimitThreshold"


def build_frontier(spark, rows: int, skew: bool):
    """Synthetic eligible-frontier slice: (origin, head_url, pr).

    skew=False: 1000 equal origins. skew=True: origin 0 holds 90% of
    all rows (the mega-domain), the rest spread over 999 origins —
    same total row count, same schema, same priority distribution.
    """
    from pyspark.sql import functions as F

    base = spark.range(0, rows)
    if skew:
        origin = F.when(
            (F.col("id") % 10) < 9, F.lit(0)
        ).otherwise((F.xxhash64("id") % 999 + 999) % 999 + 1)
    else:
        origin = F.col("id") % 1000
    return base.select(
        F.concat(F.lit("http://d"), origin.cast("string"),
                 F.lit(".org")).alias("origin"),
        F.concat(F.lit("http://d"), origin.cast("string"),
                 F.lit(".org/p"), F.col("id").cast("string"))
        .alias("head_url"),
        F.struct(
            (F.xxhash64(F.col("id") + 7) % 5).cast("int").alias("length"),
            F.lit(1).alias("created_round"),
            F.col("id").alias("seq")).alias("pr"),
    )


def run_case(spark, rows: int, k: int, skew: bool, pushdown: bool) -> dict:
    from pyspark.sql import Window, functions as F

    prev = spark.conf.get(THRESH_CONF)
    spark.conf.set(THRESH_CONF, "1000" if pushdown else "-1")
    try:
        df = build_frontier(spark, rows, skew)
        per_dom = Window.partitionBy("origin").orderBy("pr", "head_url")
        ranked = (df.withColumn("dom_rk", F.row_number().over(per_dom))
                  .filter(F.col("dom_rk") <= k))
        plan = ranked._jdf.queryExecution().executedPlan().toString()
        t0 = time.time()
        n = ranked.count()
        dt = time.time() - t0
        return {"sec": round(dt, 2), "rows_out": n,
                "window_group_limit": "WindowGroupLimit" in plan}
    finally:
        spark.conf.set(THRESH_CONF, prev)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--out", default="BENCH/skew_r4.json")
    args = ap.parse_args()

    from derzis_spark.engine import build_session

    spark = build_session(app="derzis-skew-bench", cores=args.cores,
                          shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    cases = {
        "uniform_pushdown": dict(skew=False, pushdown=True),
        "mega_domain_pushdown": dict(skew=True, pushdown=True),
        "mega_domain_no_pushdown": dict(skew=True, pushdown=False),
    }
    runs: dict[str, list[dict]] = {name: [] for name in cases}
    # interleaved repeats (§10 noise protocol): each round runs every
    # case once before any case repeats
    for _ in range(args.repeat):
        for name, kw in cases.items():
            runs[name].append(run_case(spark, args.rows, args.k, **kw))
    out = {
        "metric": ("per-domain top-k over a 90%-mega-domain frontier "
                   "slice: WindowGroupLimit pushdown vs disabled"),
        "rows": args.rows, "k": args.k, "cores": args.cores,
        "runs": runs,
        "median_sec": {
            name: statistics.median(r["sec"] for r in rs)
            for name, rs in runs.items()},
        "rows_out": {name: rs[0]["rows_out"] for name, rs in runs.items()},
        "plan_has_window_group_limit": {
            name: rs[0]["window_group_limit"] for name, rs in runs.items()},
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps(out["median_sec"]), json.dumps(out["rows_out"]))
    spark.stop()


if __name__ == "__main__":
    main()
