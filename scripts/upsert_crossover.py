#!/usr/bin/env python
"""Merge-on-read crossover: per-commit cost of a round-sized mutation
(touched ≈ 2k rows) against a base table of growing size, full-rewrite
vs upsert-delta, each charged with one post-commit reconciled read
(every round reads what it committed). Interleaved per size.

The crawl-loop A/B (BENCH/snapshot_ab_r5.json) showed upserts LOSE at
bench scale (20k-95k-row tables): the chain's fixed costs (extra
dirs, reconcile plan, window over deltas) exceed the store-sized
rewrite they avoid. This script measures where that flips — the
gate ``snapshot_upsert_min_rows`` defaults just above the measured
crossover, exactly how the append tables' 1M gate was set in r4.

At the largest size it also measures a read over an 8-deltas-deep
chain (the compaction-bounded worst case a reader can see).

    python scripts/upsert_crossover.py [--out BENCH/upsert_crossover_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOUCHED = 2_000
SIZES = (100_000, 400_000, 1_600_000, 6_400_000)


def base_df(spark, n):
    from pyspark.sql import functions as F

    return (spark.range(n).select(
        F.concat(F.lit("http://example.org/u"), F.col("id"))
        .alias("url"),
        F.concat(F.lit("http://o"), F.pmod("id", F.lit(1000)))
        .alias("origin"),
        F.lit("unvisited").alias("status"),
        F.lit(None).cast("int").alias("crawl_round"),
        F.lit(None).cast("int").alias("crawl_counter")))


def upd_df(spark, n, rnd):
    from pyspark.sql import functions as F

    # a round's touched set: TOUCHED urls spread across the table
    return (spark.range(TOUCHED).select(
        F.concat(F.lit("http://example.org/u"),
                 F.pmod(F.col("id") * 7919 + rnd, F.lit(n)))
        .alias("url"))
        .distinct()
        .withColumn("new_status", F.lit("done"))
        .withColumn("new_cr", F.lit(rnd).cast("int")))


def merged(base, upd):
    from pyspark.sql import functions as F

    return (base.join(F.broadcast(upd), "url", "left")
            .select("url", "origin",
                    F.coalesce("new_status", "status").alias("status"),
                    F.coalesce("new_cr", "crawl_round").cast("int")
                    .alias("crawl_round"),
                    "crawl_counter"))


def one_mode(spark, n, mode, n_commits=1):
    from pyspark.sql import functions as F

    from derzis_spark.storage import SnapshotStore

    wd = tempfile.mkdtemp(prefix=f"xover_{mode}_{n}_")
    try:
        store = SnapshotStore(wd)
        base = base_df(spark, n)
        man = store.commit(spark, 0, {"resources": base}, {}, 0,
                          bucket_by={"resources": ("url", 16)})
        cur = store.load_tables(spark, 0)["resources"]
        commit_s = []
        for rnd in range(1, n_commits + 1):
            upd = upd_df(spark, n, rnd)
            t0 = time.time()
            if mode == "full":
                man = store.commit(
                    spark, rnd, {"resources": merged(cur, upd)}, {}, 0,
                    bucket_by={"resources": ("url", 16)},
                    prev_manifest=man)
            else:
                delta = merged(cur, upd).join(
                    upd.select("url"), "url", "left_semi")
                man = store.commit(
                    spark, rnd, {}, {}, 0,
                    bucket_by={"resources": ("url", 16)},
                    upserts={"resources": (delta, "url",
                                           man["tables"]["resources"]
                                           ["rows"])},
                    prev_manifest=man)
            commit_s.append(round(time.time() - t0, 3))
            cur = store.load_tables(spark, rnd)["resources"]
        t0 = time.time()
        n_done = cur.filter(F.col("status") == "done").count()
        read_s = round(time.time() - t0, 3)
        assert n_done > 0
        return {"mode": mode, "rows": n, "commits": n_commits,
                "commit_s": commit_s, "read_s": read_s}
    finally:
        shutil.rmtree(wd, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH/upsert_crossover_r5.json")
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from derzis_spark.engine import build_session

    spark = build_session(app="derzis-upsert-xover", cores=args.cores,
                          shuffle_partitions=max(8, args.cores))
    spark.sparkContext.setLogLevel("ERROR")
    runs = []
    for n in SIZES:
        for mode in ("upsert", "full", "full", "upsert"):
            runs.append(one_mode(spark, n, mode))
            print(json.dumps(runs[-1]), flush=True)
    # chain-depth worst case at the largest size
    chain8 = [one_mode(spark, SIZES[-1], "upsert", n_commits=8),
              one_mode(spark, SIZES[-1], "full", n_commits=8)]
    for r in chain8:
        print(json.dumps(r), flush=True)
    by = {}
    for r in runs:
        key = (r["rows"], r["mode"])
        by.setdefault(key, []).append(r["commit_s"][0] + r["read_s"])
    summary = {
        f"{rows}": {
            "full_s": round(min(by[(rows, 'full')]), 3),
            "upsert_s": round(min(by[(rows, 'upsert')]), 3)}
        for rows in SIZES}
    out = {
        "metric": "one round-sized mutation (2k rows): commit + "
                  "reconciled read, full rewrite vs upsert delta",
        "touched": TOUCHED,
        "runs": runs,
        "chain8": chain8,
        "summary_min_commit_plus_read": summary,
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
