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

#: synthetic hash-bucket partition column (dropped on load)
BUCKET_COL = "_bucket"


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _round_dir(self, rnd: int) -> str:
        return os.path.join(self.root, f"r{rnd:04d}")

    @staticmethod
    def table_paths(info: dict) -> list[str]:
        """Resolve a manifest table entry to its data paths: delta
        entries carry a ``paths`` chain (base + appended delta dirs);
        full entries carry a single ``path``."""
        return list(info.get("paths") or [info["path"]])

    def _write_one(self, spark, df, path: str, spec, partition_cols):
        """Write one parquet dir (bucketed when ``spec``); returns
        (row_count, per-bucket counts or None).

        Counts ride the WRITE job via the Observation API (a
        CollectMetrics node over the written rows: one total count
        plus one conditional count per bucket) — the pre-r5 read-back
        scan cost an extra O(table) read per table per commit, which
        for full rewrites doubled the commit's store I/O."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        writer_df = df
        cols = list(partition_cols or [])
        n_buckets = 0
        if spec:
            key_col, n_buckets = spec
            writer_df = df.withColumn(
                BUCKET_COL,
                F.pmod(F.xxhash64(F.col(key_col)),
                       F.lit(n_buckets)).cast("int"))
            cols = [BUCKET_COL] + cols
        obs = Observation()
        metrics = [F.count(F.lit(1)).alias("n")] + [
            F.count(F.when(F.col(BUCKET_COL) == i, 1)).alias(f"b{i}")
            for i in range(n_buckets)]
        writer_df = writer_df.observe(obs, *metrics)
        writer = writer_df.write.mode("overwrite")
        if cols:
            writer = writer.partitionBy(*cols)
        writer.parquet(path)
        got = obs.get
        n = got["n"]
        if n == 0 and cols:
            # an empty partitioned write leaves no data files to
            # infer a schema from — rewrite flat (still empty), but
            # keep the bucket METADATA (empty partition map) so a
            # later delta can still chain lineage off this base
            df.write.mode("overwrite").parquet(path)
            return 0, ({} if spec else None)
        if spec:
            pc = {i: got[f"b{i}"] for i in range(n_buckets)
                  if got[f"b{i}"]}
            return n, {str(k): pc[k] for k in sorted(pc)}
        return n, None

    def commit(self, spark, rnd: int, tables: dict, metrics: dict,
               seq_counter: int, partition_by: dict | None = None,
               bucket_by: dict | None = None,
               steps: list | None = None,
               deltas: dict | None = None,
               upserts: dict | None = None,
               prev_manifest: dict | None = None) -> dict:
        """Write ``tables`` (name → DataFrame) + manifest for round ``rnd``.

        ``bucket_by`` maps table name → (key_column, n_buckets): the
        table is written hash-partitioned on ``pmod(xxhash64(key), n)``
        (the Iceberg ``bucket(n, key)`` partition transform — the north
        rule's domain/url-hash partitioning; a hash of the natural key
        is inherently skew-free, which is the salting story for
        mega-domains). Per-bucket row counts land in the manifest as
        per-partition lineage.

        ``deltas`` maps table name → DataFrame of ONLY the rows added
        since ``prev_manifest`` (Iceberg append-snapshot semantics):
        the commit writes just the delta dir and publishes a manifest
        whose ``paths`` chain is the previous chain plus the new dir —
        commit I/O scales with the ROUND, not the store. An empty
        delta carries the previous entry forward untouched (zero I/O).
        Rewritten rows can never ride a delta — the caller must fall
        back to a full write (``tables``) for any table whose existing
        rows changed, and should periodically compact long chains the
        same way.

        ``upserts`` maps table name → ``(delta_df, merge_key,
        reconciled_rows)`` — merge-on-read UPDATE deltas for tables
        whose rows mutate in place (Iceberg v2 merge-on-read MERGE
        snapshots): ``delta_df`` holds the full new row for every key
        that may have changed since ``prev_manifest`` (unique per
        ``merge_key``; unchanged rows may ride along — upserting an
        identical row is a no-op), and readers reconcile per key with
        last-writer-wins across the chain (``load_tables``). Commit
        I/O is O(touched rows), not O(store). ``reconciled_rows`` is
        the caller's exact post-reconcile row count (base rows + rows
        whose key is new) — counting it here would need an O(store)
        anti-join, and the engine already knows its insert counts.
        For upsert chains the manifest's ``partitions`` keeps
        describing the BASE snapshot; per-delta bucket counts append
        to ``delta_lineage`` (which commit touched which buckets —
        the per-partition lineage story for mutable tables).

        The manifest is written last — a crash mid-write leaves a
        dangling round directory that ``latest_round`` ignores, so
        commits are effectively atomic (Iceberg's manifest-pointer
        trick)."""
        rdir = self._round_dir(rnd)
        partition_by = partition_by or {}
        bucket_by = bucket_by or {}
        deltas = deltas or {}
        entries: dict[str, dict] = {}
        for name, df in tables.items():
            path = os.path.join(rdir, name)
            n, parts = self._write_one(
                spark, df, path, bucket_by.get(name),
                partition_by.get(name))
            entries[name] = {
                "path": path,
                "rows": n,
                **({"bucket_key": bucket_by[name][0],
                    "n_buckets": bucket_by[name][1],
                    "partitions": parts} if parts is not None else {}),
            }
        for name, df in deltas.items():
            prev = (prev_manifest or {}).get("tables", {}).get(name)
            assert prev is not None, \
                f"delta commit for {name} needs a previous manifest"
            if df is None:
                # caller knows the table gained nothing: carry the
                # previous entry forward with zero I/O AND zero jobs
                # (a known-empty write still costs a Spark job)
                entries[name] = dict(prev)
                continue
            path = os.path.join(rdir, name)
            n, parts = self._write_one(
                spark, df, path, bucket_by.get(name),
                partition_by.get(name))
            chain = self.table_paths(prev)
            entry = dict(prev)
            if n:
                entry["paths"] = chain + [path]
                entry.pop("path", None)
                entry["rows"] = prev["rows"] + n
                if parts is not None and "partitions" in prev:
                    merged = dict(prev["partitions"])
                    for k, v in parts.items():
                        merged[k] = merged.get(k, 0) + v
                    entry["partitions"] = merged
            # n == 0: carry the previous entry forward (the empty dir
            # stays unreferenced, like any dangling crash debris)
            entries[name] = entry
        for name, (df, key, new_rows) in (upserts or {}).items():
            prev = (prev_manifest or {}).get("tables", {}).get(name)
            assert prev is not None, \
                f"upsert commit for {name} needs a previous manifest"
            if df is None:  # known-untouched: zero I/O, zero jobs
                entries[name] = dict(prev)
                continue
            path = os.path.join(rdir, name)
            n, parts = self._write_one(
                spark, df, path, bucket_by.get(name),
                partition_by.get(name))
            entry = dict(prev)
            if n:
                entry["paths"] = self.table_paths(prev) + [path]
                entry.pop("path", None)
                entry["merge_key"] = key
                entry["rows"] = new_rows
                entry["delta_lineage"] = list(
                    prev.get("delta_lineage", ())) + [{
                        "path": path, "rows": n,
                        **({"partitions": parts}
                           if parts is not None else {})}]
            entries[name] = entry
        manifest = {
            "round": rnd,
            "seq_counter": seq_counter,
            #: per-step config log — the cross-run validator's
            #: precondition surface (scripts/compare_runs.py)
            "steps": list(steps or []),
            "tables": entries,
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

    #: past this many total upsert-delta rows the reconcile anti-join
    #: stops hinting a broadcast of the touched-key set and lets the
    #: join planner (AQE) choose — a month of mega-round deltas must
    #: not be forced through one executor's broadcast build
    UPSERT_BCAST_LIMIT = 4_000_000
    #: much lower gate for STRING merge keys (resources/paths key on
    #: full URLs, ~100 bytes each): 4M URL keys would be a multi-
    #: hundred-MB explicit broadcast that bypasses Spark's size-based
    #: gating exactly in the large-store regime upserts target; 500k
    #: string keys ≈ 50 MB framed, safely inside executor memory
    UPSERT_BCAST_LIMIT_STR = 500_000

    def load_tables(self, spark, rnd: int) -> dict:
        manifest = self.read_manifest(rnd)
        out = {}
        for name, info in manifest["tables"].items():
            dfs = []
            for p in self.table_paths(info):
                df = spark.read.parquet(p)
                if BUCKET_COL in df.columns:
                    df = df.drop(BUCKET_COL)
                dfs.append(df)
            key = info.get("merge_key")
            if key and len(dfs) > 1:
                # merge-on-read reconcile: last writer wins per key.
                # Deltas are chain-position-ranked among THEMSELVES
                # (O(touched × chain) rows, bounded by compaction);
                # the base never shuffles — it takes one anti-join
                # against the touched-key set, broadcast under the
                # size gate (delta row counts come from the manifest,
                # no job needed), so reading a 10^10-row base with a
                # round-sized delta costs a scan + broadcast probe
                from pyspark.sql import functions as F
                from pyspark.sql.window import Window

                base, deltas = dfs[0], dfs[1:]
                d = deltas[0].withColumn("_cpos", F.lit(0))
                for i, extra in enumerate(deltas[1:], start=1):
                    d = d.unionByName(extra.withColumn("_cpos", F.lit(i)))
                w = Window.partitionBy(key).orderBy(F.col("_cpos").desc())
                winner = (d.withColumn("_rn", F.row_number().over(w))
                          .filter(F.col("_rn") == 1).drop("_rn", "_cpos"))
                keys_df = d.select(key).distinct()
                n_delta = sum(e["rows"]
                              for e in info.get("delta_lineage", ()))
                from pyspark.sql.types import StringType
                limit = (self.UPSERT_BCAST_LIMIT_STR
                         if isinstance(d.schema[key].dataType, StringType)
                         else self.UPSERT_BCAST_LIMIT)
                if n_delta <= limit:
                    keys_df = F.broadcast(keys_df)
                out[name] = (base.join(keys_df, key, "left_anti")
                             .unionByName(winner))
                continue
            df = dfs[0]
            for extra in dfs[1:]:
                df = df.unionByName(extra)
            out[name] = df
        return out
