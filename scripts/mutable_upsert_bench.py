#!/usr/bin/env python
"""Mutable-table snapshot A/B: merge-on-read upserts vs full rewrites.

Runs the standard crawl bench workload (24k pages / 10 rounds) WITH a
snapshot store attached, alternating two modes of the SAME code:

  - ``upsert``: ``snapshot_upsert_min_rows=0`` — the mutable tables
    (resources / domains / paths) commit only the rows touched that
    round as merge-on-read update deltas; readers reconcile
    last-writer-wins per key.
  - ``full``: ``snapshot_upsert_min_rows=2**60`` — every commit
    rewrites the mutable tables in full (the pre-r5 behavior,
    reachable as the degenerate gate).

Append-table gates stay at their defaults in BOTH modes so the
mutable-table regime is the only variable. Interleaved order per the
BENCH/BASELINE.md §10 noise protocol. Records per-round
``snapshot_s``, per-mode totals, final mutable chain lengths, and a
sanity check that both modes publish identical final row counts.

    python scripts/mutable_upsert_bench.py [--pairs 3] [--cores 32] \
        [--out BENCH/snapshot_ab_r5.json]
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

MUT = ("resources", "domains", "paths")


def run_one(spark, pages, robots, seeds, cfg, mode: str) -> dict:
    from derzis_spark.engine import CrawlEngine
    from derzis_spark.storage import SnapshotStore

    wd = tempfile.mkdtemp(prefix=f"derzis_mut_ab_{mode}_")
    try:
        engine = CrawlEngine(spark, pages, robots, cfg, work_dir=wd)
        engine.snapshot_upsert_min_rows = 0 if mode == "upsert" else 2**60
        t0 = time.time()
        engine.run(seeds)
        total = time.time() - t0
        store = SnapshotStore(wd)
        man = store.read_manifest(store.latest_round())
        snap = [m.get("snapshot_s", 0.0) for m in engine.metrics]
        return {
            "mode": mode,
            "rounds": engine.round,
            "total_sec": round(total, 2),
            "urls": sum(m.get("scheduled", 0) for m in engine.metrics),
            "snapshot_s_per_round": snap,
            "snapshot_s_total": round(sum(snap), 2),
            "final_chain_lengths": {
                t: len(SnapshotStore.table_paths(man["tables"][t]))
                for t in MUT},
            "final_rows": {t: man["tables"][t]["rows"]
                           for t in man["tables"]},
        }
    finally:
        shutil.rmtree(wd, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--out", default="BENCH/snapshot_ab_r5.json")
    args = ap.parse_args()

    from bench import CRAWL_CONFIG, CRAWL_FIXTURE
    from derzis_spark import schemas
    from derzis_spark.config import CrawlConfig
    from derzis_spark.engine import build_session
    from derzis_spark.fixtures import generate_fixture

    spark = build_session(app="derzis-mut-upsert-ab", cores=args.cores,
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
        modes = ("upsert", "full") if i % 2 == 0 else ("full", "upsert")
        for mode in modes:
            runs.append(run_one(spark, pages, robots, seeds, cfg, mode))
    ups = [r for r in runs if r["mode"] == "upsert"]
    full = [r for r in runs if r["mode"] == "full"]
    # both modes publish the same logical store (upsert manifests carry
    # exact reconciled counts — tests/test_mutable_upserts.py)
    for a in runs:
        for t in ("triples", "trace", *MUT):
            assert a["final_rows"][t] == runs[0]["final_rows"][t], \
                (t, a["final_rows"][t], runs[0]["final_rows"][t])
    out = {
        "metric": "per-round snapshot commit, mutable tables: "
                  "merge-on-read upserts vs full rewrites, interleaved",
        "workload": "bench crawl fixture, 10 rounds, snapshot store on",
        "cores": args.cores,
        "runs": runs,
        "snapshot_total_median": {
            "upsert": round(statistics.median(
                r["snapshot_s_total"] for r in ups), 2),
            "full": round(statistics.median(
                r["snapshot_s_total"] for r in full), 2),
        },
        "crawl_total_median": {
            "upsert": round(statistics.median(
                r["total_sec"] for r in ups), 2),
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
