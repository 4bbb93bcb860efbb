#!/usr/bin/env python
"""Snapshot-commit A/B: delta (Iceberg append-snapshot) vs full-rewrite.

Runs the standard crawl bench workload (24k pages / 10 rounds) WITH a
snapshot store attached, alternating two modes of the SAME code:

  - ``delta``: ``snapshot_compact_chain=16`` (the default) — the
    append-only tables (triples / trace / proc ledgers) commit only the
    rows added that round and chain manifest paths.
  - ``full``:  ``snapshot_compact_chain=1`` — every commit rewrites
    every table in full (the pre-delta behavior, reachable as the
    degenerate chain cap).

Interleaved order (delta/full, full/delta, …) per the BENCH/BASELINE.md
§10 noise protocol. Records per-round ``snapshot_s``, per-mode totals,
final chain lengths, and a sanity check that both modes publish
identical final row counts.

    python scripts/snapshot_bench.py [--pairs 3] [--cores 32] \
        [--out BENCH/snapshot_ab_r4.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(spark, pages, robots, seeds, cfg, compact_chain: int) -> dict:
    from derzis_spark.engine import CrawlEngine
    from derzis_spark.storage import SnapshotStore

    wd = tempfile.mkdtemp(prefix=f"derzis_snap_ab_{compact_chain}_")
    try:
        engine = CrawlEngine(spark, pages, robots, cfg, work_dir=wd)
        engine.snapshot_compact_chain = compact_chain
        # disable the small-table gate (snapshot_delta_min_rows) so the
        # chain cap is the ONLY variable: this A/B is exactly what
        # motivated the gate's default (BENCH/snapshot_ab_r4.json)
        engine.snapshot_delta_min_rows = 0
        t0 = time.time()
        engine.run(seeds)
        total = time.time() - t0
        store = SnapshotStore(wd)
        last = store.latest_round()
        man = store.read_manifest(last)
        snap = [m.get("snapshot_s", 0.0) for m in engine.metrics]
        chains = {
            t: len(SnapshotStore.table_paths(man["tables"][t]))
            for t in ("triples", "trace", "proc_triples",
                      "proc_done_resources")}
        return {
            "compact_chain": compact_chain,
            "rounds": engine.round,
            "total_sec": round(total, 2),
            "snapshot_s_per_round": snap,
            "snapshot_s_total": round(sum(snap), 2),
            "final_chain_lengths": chains,
            "final_rows": {t: man["tables"][t]["rows"]
                           for t in man["tables"]},
        }
    finally:
        shutil.rmtree(wd, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--out", default="BENCH/snapshot_ab_r4.json")
    args = ap.parse_args()

    from bench import CRAWL_CONFIG, CRAWL_FIXTURE
    from derzis_spark import schemas
    from derzis_spark.config import CrawlConfig
    from derzis_spark.engine import build_session
    from derzis_spark.fixtures import generate_fixture

    spark = build_session(app="derzis-snapshot-ab", cores=args.cores,
                          shuffle_partitions=max(8, args.cores))
    spark.sparkContext.setLogLevel("ERROR")
    fx = generate_fixture(**CRAWL_FIXTURE)
    pages = spark.createDataFrame(fx.pages_rows(), schemas.PAGES)
    pages.cache()
    pages.count()
    robots = spark.createDataFrame(fx.robots_rows(), schemas.ROBOTS)
    seeds = spark.createDataFrame([(u,) for u in fx.seeds], schemas.SEEDS)
    cfg = CrawlConfig(**CRAWL_CONFIG)

    runs: list[dict] = []
    for i in range(max(1, args.pairs)):
        modes = (16, 1) if i % 2 == 0 else (1, 16)
        for chain in modes:
            runs.append(run_one(spark, pages, robots, seeds, cfg, chain))
    delta = [r for r in runs if r["compact_chain"] == 16]
    full = [r for r in runs if r["compact_chain"] == 1]
    # both modes publish the same logical store — proc ledgers are
    # merge-on-read so delta-mode PHYSICAL rows may exceed full-mode's
    for a in runs:
        for t in ("triples", "trace", "resources", "domains", "paths"):
            assert a["final_rows"][t] == runs[0]["final_rows"][t], \
                (t, a["final_rows"][t], runs[0]["final_rows"][t])
    out = {
        "metric": "per-round snapshot commit: delta chain (16) vs "
                  "full rewrite (1), interleaved",
        "workload": "bench crawl fixture, 10 rounds, snapshot store on",
        "cores": args.cores,
        "runs": runs,
        "snapshot_total_median": {
            "delta": round(statistics.median(
                r["snapshot_s_total"] for r in delta), 2),
            "full": round(statistics.median(
                r["snapshot_s_total"] for r in full), 2),
        },
        "crawl_total_median": {
            "delta": round(statistics.median(
                r["total_sec"] for r in delta), 2),
            "full": round(statistics.median(
                r["total_sec"] for r in full), 2),
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps({k: out[k] for k in
                      ("snapshot_total_median", "crawl_total_median")}))


if __name__ == "__main__":
    main()
