#!/usr/bin/env python
"""Cross-run validator: compare two crawl snapshot roots.

Port of the reference validator (validator/src/lib/cmp-results.ts:4-72
+ diff.ts:1-28) over two ``SnapshotStore`` roots:

1. **Precondition check** (``checkPreConditions``): the two runs must
   have the same number of steps, and each step must agree on
   maxPathLength, maxPathProps, the seed list and the predicate
   limitations — otherwise the runs are not comparable and the diff is
   refused (exit code 2).
2. **Count deltas** (``cmpCounts``): resources / triples / domains /
   paths totals per run, with the delta.
3. **Triple-set diff** (``diffTripleArrays``): triples only in run 1 /
   only in run 2, on the sorted (subject, predicate, object) key set.

Runs entirely on DuckDB over the snapshot parquet (no Spark session):
the manifest already carries the row counts and step log, and the
triple diff is two anti-joins over the bucketed triple table — the
same shape would run distributed for mega-stores.

Usage:
    python scripts/compare_runs.py <root1> <root2> [--max-samples N]

Prints a single JSON report to stdout.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COUNT_TABLES = ("resources", "triples", "domains", "paths")
TRIPLE_KEY = ("subject", "predicate", "object_kind", "object_value",
              "object_datatype", "object_language")


def latest_manifest(root: str) -> dict:
    from derzis_spark.storage import SnapshotStore

    store = SnapshotStore(root)
    rnd = store.latest_round()
    if rnd is None:
        raise FileNotFoundError(f"no snapshot under {root}")
    return store.read_manifest(rnd)


def check_preconditions(steps1: list, steps2: list) -> tuple[bool, list]:
    """cmp-results.ts:4-52 — step-config precondition; returns
    (ok, list of human-readable mismatch reasons)."""
    problems: list[str] = []
    if len(steps1) != len(steps2):
        return False, ["Different number of steps"]
    for i, (s1, s2) in enumerate(zip(steps1, steps2)):
        if s1.get("max_path_length") != s2.get("max_path_length"):
            problems.append(f"Different maxPathLength at step {i}")
        if s1.get("max_path_props") != s2.get("max_path_props"):
            problems.append(f"Different maxPathProps at step {i}")
        if list(s1.get("seeds") or []) != list(s2.get("seeds") or []):
            problems.append(f"Different seeds at step {i}")
        if (s1.get("pred_limitations") or []) != \
                (s2.get("pred_limitations") or []):
            problems.append(f"Different predicate limitations at step {i}")
    return not problems, problems


def cmp_counts(m1: dict, m2: dict) -> dict:
    """cmp-results.ts:55-72 — per-table totals + delta (manifest row
    counts; no data scan needed)."""
    out = {}
    for t in COUNT_TABLES:
        c1 = (m1["tables"].get(t) or {}).get("rows", 0)
        c2 = (m2["tables"].get(t) or {}).get("rows", 0)
        out[t] = {"run1": c1, "run2": c2, "delta": c2 - c1}
    return out


def _triples_globs(manifest: dict) -> list:
    info = manifest["tables"]["triples"]
    # delta (append-snapshot) manifests carry a paths chain; full
    # manifests a single path
    paths = info.get("paths") or [info["path"]]
    out = []
    for path in paths:
        # bucketed writes nest parquet under _bucket=N/ partitions
        if glob.glob(os.path.join(path, "*.parquet")):
            out.append(os.path.join(path, "*.parquet"))
        else:
            out.append(os.path.join(path, "**", "*.parquet"))
    return out


def diff_triples(m1: dict, m2: dict, max_samples: int) -> dict:
    """diff.ts:16-22 — set diff over the sorted triple key arrays, as
    two anti-joins (EXCEPT) on DuckDB."""
    import duckdb

    con = duckdb.connect()
    key = ", ".join(TRIPLE_KEY)
    # datatype/language are '' in the reference key but may be stored
    # NULL — normalize so both runs (and the oracle) agree on the key
    sel = ", ".join(f"COALESCE({c}, '') AS {c}" for c in TRIPLE_KEY)
    for name, m in (("t1", m1), ("t2", m2)):
        # one SELECT per chain dir (a dir is uniformly flat or
        # hive-partitioned, but the chain can mix the two — e.g. a
        # flat empty base under bucketed deltas)
        selects = " UNION ALL ".join(
            f"SELECT {sel} FROM read_parquet('{g}', "
            f"hive_partitioning=true)" for g in _triples_globs(m))
        con.execute(f"CREATE VIEW {name} AS {selects}")
    only = {}
    for label, a, b in (("only_in_run1", "t1", "t2"),
                        ("only_in_run2", "t2", "t1")):
        n = con.execute(
            f"SELECT COUNT(*) FROM (SELECT {key} FROM {a} EXCEPT "
            f"SELECT {key} FROM {b})").fetchone()[0]
        sample = con.execute(
            f"SELECT {key} FROM (SELECT {key} FROM {a} EXCEPT "
            f"SELECT {key} FROM {b}) ORDER BY {key} "
            f"LIMIT {int(max_samples)}").fetchall()
        only[label] = {
            "count": n,
            "sample": [list(map(str, r)) for r in sample],
        }
    return only


def compare(root1: str, root2: str, max_samples: int = 10) -> dict:
    m1 = latest_manifest(root1)
    m2 = latest_manifest(root2)
    ok, problems = check_preconditions(
        m1.get("steps", []), m2.get("steps", []))
    report = {
        "run1": {"root": root1, "round": m1["round"]},
        "run2": {"root": root2, "round": m2["round"]},
        "preconditions_ok": ok,
        "precondition_problems": problems,
        "counts": cmp_counts(m1, m2),
    }
    if ok:
        report["triples"] = diff_triples(m1, m2, max_samples)
    return report


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("root1")
    ap.add_argument("root2")
    ap.add_argument("--max-samples", type=int, default=10)
    args = ap.parse_args()
    report = compare(args.root1, args.root2, args.max_samples)
    print(json.dumps(report, indent=1))
    return 0 if report["preconditions_ok"] else 2


if __name__ == "__main__":
    sys.exit(main())
