#!/usr/bin/env python
"""Store-ON crawl A/B between two CODE versions (current repo vs a
ref worktree), interleaved — the round-5 snapshot-cost evidence the
suite A/B doesn't carry (bench.py --ab compares suite + store-off
crawl only).

Each side runs in its own subprocess with that side's code on
sys.path/PYTHONPATH, executing ``bench.run_crawl(spark, repeat=1,
with_store=True)`` — identical workload, per-round durable snapshot
commits, alternating order per pair.

    python scripts/snapshot_ab_sides.py --ref-dir /tmp/derzis_ab_XXXX \
        [--pairs 3] [--out BENCH/snapshot_sides_ab_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = (
    "import sys, json; sys.path.insert(0, '.');\n"
    "import bench\n"
    "spark = bench.build(32, 32)\n"
    "out = bench.run_crawl(spark, repeat=1, with_store=True)\n"
    "print('SNAPAB ' + json.dumps(out))\n"
)


def one(side_dir: str) -> dict:
    env = {**os.environ, "PYTHONPATH": side_dir}
    proc = subprocess.run(
        [sys.executable, "-c", CHILD], capture_output=True, text=True,
        check=True, cwd=side_dir, env=env)
    line = next(ln for ln in proc.stdout.splitlines()
                if ln.startswith("SNAPAB "))
    return json.loads(line[len("SNAPAB "):])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-dir", required=True)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--out", default="BENCH/snapshot_sides_ab_r5.json")
    args = ap.parse_args()

    pair_rows = []
    for i in range(max(1, args.pairs)):
        order = ([("ref", args.ref_dir), ("cur", REPO)] if i % 2 == 0
                 else [("cur", REPO), ("ref", args.ref_dir)])
        res = {}
        for tag, d in order:
            res[tag] = one(d)
            print(tag, json.dumps(res[tag]), flush=True)
        pair_rows.append({
            "order": [t for t, _ in order],
            "ref": res["ref"], "cur": res["cur"],
            "ups_ratio": round(res["cur"]["urls_per_sec"]
                               / res["ref"]["urls_per_sec"], 3),
            "snapshot_s_ratio": round(
                res["cur"]["snapshot_s_total"]
                / res["ref"]["snapshot_s_total"], 3),
        })
    out = {
        "metric": "store-ON crawl (per-round durable snapshot "
                  "commits), current vs ref code, interleaved",
        "ref_dir": args.ref_dir,
        "pairs": pair_rows,
        "ups_ratio_median": round(statistics.median(
            p["ups_ratio"] for p in pair_rows), 3),
        "snapshot_s_ratio_median": round(statistics.median(
            p["snapshot_s_ratio"] for p in pair_rows), 3),
        "note": "ratios are cur/ref: ups_ratio >1 and "
                "snapshot_s_ratio <1 mean current is faster",
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f)
    print(json.dumps({k: out[k] for k in
                      ("ups_ratio_median", "snapshot_s_ratio_median")}))


if __name__ == "__main__":
    main()
