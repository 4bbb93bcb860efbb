"""The round-synchronous Spark crawl engine.

Each round is one deterministic DataFrame job over the state tables
(SURVEY.md §7.0), committed as a parquet+manifest snapshot:

Phase A  robots checks for unvisited domains
         (reference two-phase scheduling: getPathsForRobotsChecking,
         models/src/Process/process-paths.ts:376-508)
Phase B  priority ranking → per-domain top-k → politeness admission →
         fetch join vs pages → extract/parse (Arrow UDFs) → triple
         merge → new-URL discovery (Bloom + anti-join) → path
         extension cascade
         (reference: process-paths.ts:560-699 priority order;
         Domain.ts:740-909 domain locking — collapsed into the
         round-synchronous schedule; TraversalPath.ts:219-399 extension)

Scale design (1000-executor cluster / 100 TB pages; tested local[32]):
- the driver only ever materializes O(per-round schedule) rows — the
  scheduled set (≤ eligible domains × per-domain budget, hard-capped by
  ``round_budget_cap``) plus per-wave done/blank head lists. The
  frontier, seen-set, triple store, trace, proc ledgers and pages table
  stay distributed end-to-end: triple MERGE is a broadcast semi-scan +
  append (no triple ever reaches the driver), new-URL inserts are
  anti-join appends with executor-side Bloom partial-union maintenance,
  and the robots fetch-gate runs vectorized inside the schedule job;
- joins against big tables keep the big side shuffle-free by
  broadcasting the (small) per-round side: fetch = pages ⋈
  broadcast(schedule), status updates = state ⋈ broadcast(updates);
- the only full-table shuffles are the triple-merge groupBy and the
  seen-set anti-join, both on uniform hash keys; the Bloom pre-pass
  (north rule) shrinks the anti-join probe side to ~dupes only;
- domains is a dimension table; its broadcast hints are size-gated on
  the tracked domain count (``_maybe_bcast``) — at 10^8 origins the
  hints drop and the joins shuffle on the bucketed key;
- per-domain top-k is a window over hash(origin) partitions; mega-
  domain skew is bounded because only *unvisited eligible heads* are
  ranked, and AQE skew handling is on.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Row, SparkSession, Window
from pyspark.sql import functions as F

from derzis_spark.config import (
    CrawlConfig, LABEL_PREDICATES, WARN_BY_STATUS)
from derzis_spark.functions import udfs
from derzis_spark.functions.core import matches_predicate_pattern
from derzis_spark import schemas
from derzis_spark.operators.seen_set import BloomFilter
from derzis_spark.storage import SnapshotStore


def build_session(app: str = "derzis-spark", cores: str | int = "*",
                  shuffle_partitions: int = 32,
                  adaptive: bool = True) -> SparkSession:
    # make the package importable in executor python workers regardless
    # of the driver's cwd (on a real cluster this is spark-submit
    # --py-files derzis_spark.zip instead)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(":"):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}:{existing}" if existing else pkg_root)
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", str(adaptive).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # snapshot count-backs (per-bucket lineage counts) resolve from
        # parquet footer metadata instead of scanning data pages;
        # unsupported shapes silently fall back to a normal scan
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _object_key_col():
    """Literal identity key value|datatype|language
    (models/src/Path/TraversalPath.ts:368); plain value otherwise."""
    return F.when(
        F.col("object_kind") == "literal",
        F.concat_ws(
            "|", F.col("object_value"),
            F.coalesce(F.col("object_datatype"), F.lit("")),
            F.coalesce(F.col("object_language"), F.lit("")),
        ),
    ).otherwise(F.col("object_value"))


_ENDS_SCHEMA = ("end string, dir_rank int, pred string, "
                "node_kind string, node_raw string, node_key string, "
                "node_c string, t_dt string, t_lang string")

#: the triple-store MERGE key (Triple.ts unique index analog)
TRIPLE_KEY = ["subject", "predicate", "object_kind", "object_value",
              "object_datatype", "object_language"]


def _semi_filter(spark, df, col: str, values, threshold: int = 64):
    """Membership filter that stays plan-friendly: literal isin for
    small sets (cheap to compile, no exchange), broadcast semi-join
    beyond the threshold (large IN-lists inflate codegen and per-task
    predicate evaluation; a broadcast hash probe does not). ``values``
    may also be a DataFrame with a ``col`` column — the frontier-scale
    path (e.g. start_step's done-head set): a plain semi-join with no
    hint, so AQE picks broadcast vs shuffle from the actual size."""
    if isinstance(values, DataFrame):
        return df.join(values.select(col).distinct(), col, "left_semi")
    if not values:
        return df.filter(F.lit(False))
    if len(values) <= threshold:
        return df.filter(F.col(col).isin(list(values)))
    vals_df = spark.createDataFrame([(v,) for v in values], f"{col} string")
    return df.join(F.broadcast(vals_df), col)


class CrawlEngine:
    """Round-synchronous BSP crawl over Spark DataFrames."""

    #: tables eligible for delta (append-snapshot) commits — the ones
    #: whose rows only ever APPEND in the common case
    DELTA_TABLES = ("triples", "trace", "proc_triples",
                    "proc_done_resources")

    #: mutable tables (statuses / clocks / counters flip in place every
    #: round) and their primary keys — eligible for merge-on-read
    #: UPSERT deltas: each mutation site records the (round-bounded)
    #: touched keys, the commit writes only those rows, and readers
    #: reconcile last-writer-wins per key (storage.load_tables)
    MUT_KEYS = {"resources": "url", "domains": "origin", "paths": "seq"}

    def __init__(self, spark: SparkSession, pages: DataFrame,
                 robots: DataFrame, config: CrawlConfig | None = None,
                 work_dir: str | None = None):
        self.spark = spark
        self.cfg = config or CrawlConfig()
        self.pages = pages
        self.robots = robots
        self.store = SnapshotStore(work_dir) if work_dir else None
        self._robots_allows = udfs.make_robots_allows(self.cfg.user_agent)
        self._robots_delay = udfs.make_robots_crawl_delay(self.cfg.user_agent)
        self.round = 0
        self.seq_counter = 0
        self._bloom: BloomFilter | None = None
        #: False until the first triple merge — gates the triple-cache
        #: fetch-skip probe (an empty store can't have cache hits)
        self._store_nonempty = False
        #: new-URL batches awaiting the per-checkpoint Bloom fold
        self._pending_bloom: list[DataFrame] = []
        #: triple-key Bloom (MERGE collision pre-pass) and source-URL
        #: Bloom (fetch-phase cache-probe pre-pass); both follow the
        #: URL filter's lifecycle: built once executor-side, batches
        #: queued per round and folded at checkpoint time, so each is
        #: always fresh w.r.t. every PREVIOUS round — which is exactly
        #: when the respective probes run. False positives fall back to
        #: the exact store joins; false negatives are impossible
        self._triple_bloom: BloomFilter | None = None
        self._source_bloom: BloomFilter | None = None
        self._pending_store_bloom: list[DataFrame] = []
        #: per-step config log (Process.steps analog) — the cross-run
        #: validator's precondition surface (validator/src/lib/
        #: cmp-results.ts:4-52 compares steps' maxPathLength /
        #: maxPathProps / seeds / predicate limitations)
        self._step_log: list[dict] = []
        # The only driver-side caches are DIMENSION-sized (per-domain —
        # the reference keeps the same per-domain robots cache,
        # models/src/Domain.ts:117-150). URL-level state (seen-set,
        # done-set, triple keys, ledgers, trace) lives exclusively in
        # the distributed tables: the driver only ever materializes
        # O(per-round schedule) rows plus per-wave done/blank head
        # lists, so rounds scale past driver memory.
        #: known-origin fast path; None once the domain dimension
        #: outgrows cfg.origin_set_limit (then: anti-join detection)
        self._known_origins: set[str] | None = set()
        self._unvisited_domains = 0
        #: tracked domain-dimension row count — gates every broadcast
        #: hint on a domains projection (a 10^8-domain crawl must not
        #: hint a multi-GB broadcast past AQE's size check)
        self._n_domains = 0
        #: robots input-table row count, counted once on first use
        #: (static input dimension; gates its broadcast hint)
        self._n_robots: int | None = None
        self._found_cache: DataFrame | None = None
        self._wave_caches: list[DataFrame] = []
        #: per-wave phase seconds of the most recent extension cascade
        #: (filled by _extend; surfaced in the round metrics row)
        self._last_extend_profile: list[dict] = []
        #: sub-phase seconds of the most recent ingest (merge+discover);
        #: profiling only — stripped from the committed manifest
        self._last_ingest_profile: dict = {}
        self._last_insert_profile: dict = {}
        # incremental edge view for path extension: rebuilt-from-scratch
        # would re-scan (and re-canonicalize) the whole triple store
        # every round; instead edges of the round's NEW (fresh) triple
        # keys are appended as a distributed projection of the fresh
        # rows (no driver materialization)
        self.ends: DataFrame | None = None
        self._triples_dirty = False
        # processTriples ledger (ProcessTriple.ts:38-51): triple keys
        # that extended a path (label-literal rule per Manager.ts:418-448)
        # and processDoneResources (ProcessDoneResource.ts:4-11):
        # sources of proc triples AS OF extension time (the
        # triples→sources→resources provenance chain,
        # process-paths.ts:897-977). Both are append-only DataFrames
        # (ledger tables), deduped at read/commit time.
        self._proc_triples_df: DataFrame | None = None
        self._proc_done_df: DataFrame | None = None
        self.metrics: list[dict] = []
        self.resources: DataFrame | None = None
        self.domains: DataFrame | None = None
        self.paths: DataFrame | None = None
        self.triples: DataFrame | None = None
        # the trace is an append-only table: the round's rows are
        # produced driver-side (the schedule is collected — the
        # round-synchronous driver contract) and appended as a
        # DataFrame; the accumulated trace is never held on the driver
        self._trace_df: DataFrame | None = None
        # append-only tables (triples/ends/trace/ledgers) have flat data
        # lineage but their logical plans grow one union node per round;
        # checkpoint them every N rounds to bound plan depth
        self._ckpt_calls = 0
        self.append_ckpt_every = 16
        # delta-commit accounting (Iceberg append snapshots): the rows
        # each append-only table gained since the last snapshot commit,
        # and whether existing rows were REWRITTEN (collision merge) —
        # a rewrite disqualifies the table from a delta commit for that
        # round. Chains longer than snapshot_compact_chain compact back
        # to a full write so a reader never unions unbounded dirs.
        self._append_deltas: dict[str, list[DataFrame]] = {
            t: [] for t in self.DELTA_TABLES}
        self._append_rewritten: dict[str, bool] = {
            t: False for t in self.DELTA_TABLES}
        self.snapshot_compact_chain = 16
        # delta commits only pay off once the table dwarfs the round's
        # additions: below this many physical rows a full rewrite is a
        # single cheap parquet write, while a delta chain adds fixed
        # per-commit costs (extra dirs, read-back counts, chain unions
        # on every later read). Measured at bench scale (47k triples,
        # BENCH/snapshot_ab_r4.json): forced-delta snapshots cost
        # 112 s vs 84 s full-rewrite over 10 rounds — so small tables
        # take the full path and the chain machinery engages only when
        # rewrite I/O (O(store)) actually exceeds it. Unchanged tables
        # still carry forward with zero I/O regardless of size.
        self.snapshot_delta_min_rows = 1_000_000
        # merge-on-read upsert accounting for the MUTABLE tables: each
        # mutation site records the keys it may have touched (bounded
        # key DataFrames / predicates — always a SUPERSET is safe,
        # upserting an unchanged row is a no-op), plus the exact count
        # of INSERTED rows (every insert site knows it already), so the
        # commit can write O(touched) rows and still publish an exact
        # reconciled row count without an O(store) anti-join. The rare
        # unbounded flips (error reset, endpoint conversion) mark the
        # table rewritten and fall back to a full write.
        self._mut_touched: dict[str, list] = {
            t: [] for t in self.MUT_KEYS}
        self._mut_preds: dict[str, list] = {t: [] for t in self.MUT_KEYS}
        self._mut_rewritten: dict[str, bool] = {
            t: False for t in self.MUT_KEYS}
        self._mut_inserts: dict[str, int] = {t: 0 for t in self.MUT_KEYS}
        # upsert deltas engage above this base-table size — below it a
        # single full parquet write beats the chain's fixed costs.
        # MEASURED, twice (BENCH/snapshot_ab_r5.json crawl A/B: forced
        # upserts cost 95 vs 68 s snapshot / 270 vs 186 s total at
        # 20k-95k-row tables; BENCH/upsert_crossover_r5.json size
        # sweep: full rewrite still wins at 6.4M rows — local NVMe
        # writes ~0.08 s per million narrow rows while the chain adds
        # ~0.3 s per delta dir at commit and ~2 s per ACTION of
        # reconcile read at chain 8). Extrapolated crossover on this
        # hardware ≈ tens of millions of rows per table; the default
        # sits there. On real object storage (order-of-magnitude
        # slower sequential writes, the Iceberg v2 regime this
        # mechanism mirrors) the crossover drops by the same order —
        # deployments there should lower the gate.
        self.snapshot_upsert_min_rows = 50_000_000
        #: test hook: after every upsert commit, reload the reconciled
        #: tables and assert exact equality with the in-memory truth
        #: (catches any mutation site missing its _touch_* call)
        self.snapshot_validate_upserts = False

    @property
    def trace(self) -> DataFrame:
        return self._trace_df

    @property
    def proc_triples(self) -> set:
        """The processTriples ledger as a set of 6-tuples (test/compare
        surface; the authoritative copy is the distributed table)."""
        return {tuple(r) for r in self._proc_triples_df.distinct().collect()}

    @property
    def proc_done_resources(self) -> set:
        return {r["url"] for r in self._proc_done_df.distinct().collect()}

    # ------------------------------------------------------------------
    # bootstrap / resume
    # ------------------------------------------------------------------
    def bootstrap(self, seeds: DataFrame) -> None:
        """Seed insertion (models/src/Resource.ts:306-331,339-507):
        canonicalize, dedup preserving first-occurrence order, create
        resources + domains + length-1 paths with deterministic seq."""
        w = Window.orderBy("file_order")
        seed_rows = (
            seeds.coalesce(1)
            .withColumn("file_order", F.monotonically_increasing_id())
            .withColumn("url", udfs.canonicalize_url(F.col("url")))
            .filter(F.col("url").isNotNull())
            .groupBy("url").agg(F.min("file_order").alias("file_order"))
            .withColumn("seq", F.row_number().over(w) - F.lit(1))
            .drop("file_order")
            .withColumn("origin", udfs.url_origin(F.col("url")))
        ).collect()  # one job; O(seed list) by definition
        self._known_origins = {r["origin"] for r in seed_rows}
        self._unvisited_domains = len(self._known_origins)
        self._n_domains = len(self._known_origins)
        self.resources = self.spark.createDataFrame(
            [(r["url"], r["origin"], "unvisited", None, None)
             for r in seed_rows],
            schemas.RESOURCES)
        self.domains = self.spark.createDataFrame(
            [(o, "unvisited", None, "", self.cfg.default_crawl_delay, 0,
              {}, [])
             for o in sorted(self._known_origins)],
            schemas.DOMAINS)
        if self.cfg.path_type == "endpoint":
            # endpoint seed paths: shortestPathLength=1,
            # seedPaths={seed: 1} (Resource.ts:339-507)
            self.paths = self.spark.createDataFrame(
                [("", r["url"], "url", r["url"], [], [],
                  1, "active", 0, int(r["seq"]), {r["url"]: 1})
                 for r in seed_rows],
                schemas.PATHS)
        else:
            self.paths = self.spark.createDataFrame(
                [(r["url"], r["url"], "url", r["url"], [r["url"]], [],
                  1, "active", 0, int(r["seq"]), None) for r in seed_rows],
                schemas.PATHS)
        self.triples = self.spark.createDataFrame([], schemas.TRIPLES)
        self.ends = self.spark.createDataFrame([], _ENDS_SCHEMA)
        self._trace_df = self.spark.createDataFrame([], schemas.TRACE)
        self._proc_triples_df = self.spark.createDataFrame(
            [], schemas.RAW_TRIPLE)
        self._proc_done_df = self.spark.createDataFrame([], "url string")
        self._reset_delta_state()
        self.seq_counter = len(seed_rows)
        self.round = 0
        self._record_step(
            [r["url"] for r in sorted(seed_rows, key=lambda r: r["seq"])])
        if self.store:
            self._commit({"phase": "bootstrap"})
        else:
            self._checkpoint_local()

    def _record_step(self, seeds: list[str]) -> None:
        """Append the current step's config to the step log — the
        surface the cross-run validator's precondition check compares
        (cmp-results.ts:4-52: step count, maxPathLength, maxPathProps,
        seeds, predicate limitations)."""
        self._step_log.append({
            "max_path_length": self.cfg.max_path_length,
            "max_path_props": self.cfg.max_path_props,
            "path_type": self.cfg.path_type,
            "seeds": list(seeds),
            "pred_limitations": [
                {"predicate": l.predicate, "lims": list(l.lims)}
                for l in self.cfg.pred_limitations],
        })

    def resume(self) -> None:
        """Deterministic mid-frontier resume from the latest snapshot."""
        assert self.store is not None, "resume needs a work_dir"
        rnd = self.store.latest_round()
        if rnd is None:
            raise FileNotFoundError(f"no snapshot under {self.store.root}")
        manifest = self.store.read_manifest(rnd)
        tables = self.store.load_tables(self.spark, rnd)
        self.resources = tables["resources"]
        self.domains = tables["domains"]
        self.paths = tables["paths"]
        self.triples = tables["triples"]
        self._trace_df = tables["trace"]
        self.round = manifest["round"]
        self.seq_counter = manifest["seq_counter"]
        self._step_log = list(manifest.get("steps", []))
        # rebuild the per-domain driver counters; past the origin gate
        # the dimension stays distributed (only counts reach the
        # driver) and new-origin detection uses the anti-join path
        counts = {r["status"]: r["n"] for r in self.domains.groupBy(
            "status").agg(F.count(F.lit(1)).alias("n")).collect()}
        n_domains = sum(counts.values())
        self._n_domains = n_domains
        self._unvisited_domains = counts.get("unvisited", 0)
        if n_domains <= self.cfg.origin_set_limit:
            self._known_origins = {
                r["origin"]
                for r in self.domains.select("origin").collect()}
        else:
            self._known_origins = None
        self._proc_triples_df = tables.get(
            "proc_triples",
            self.spark.createDataFrame([], schemas.RAW_TRIPLE))
        self._proc_done_df = tables.get(
            "proc_done_resources",
            self.spark.createDataFrame([], "url string"))
        self._reset_delta_state()
        # rebuild the edge view once from the triple store
        # (a full scan at resume, then incremental again)
        self.ends = self._ends_of(self.triples).localCheckpoint(eager=True)
        self._store_nonempty = True

    def _reset_delta_state(self) -> None:
        """Forget per-commit delta accounting — called whenever the
        in-memory tables re-sync with a snapshot (bootstrap, resume,
        post-commit reload)."""
        self._append_deltas = {t: [] for t in self.DELTA_TABLES}
        self._append_rewritten = {t: False for t in self.DELTA_TABLES}
        self._mut_touched = {t: [] for t in self.MUT_KEYS}
        self._mut_preds = {t: [] for t in self.MUT_KEYS}
        self._mut_rewritten = {t: False for t in self.MUT_KEYS}
        self._mut_inserts = {t: 0 for t in self.MUT_KEYS}

    def _touch_keys(self, table: str, col: str, keys: DataFrame) -> None:
        """Record that rows of ``table`` whose ``col`` is in ``keys``
        may have changed since the last snapshot (merge-on-read upsert
        tracking). ``keys`` must be round-bounded; supersets are safe."""
        if self.store:
            self._mut_touched[table].append((col, keys))

    def _touch_pred(self, table: str, pred) -> None:
        """Predicate form of ``_touch_keys`` — used for inserts whose
        key frames would re-execute heavy cascade plans (paths created
        this round are exactly ``created_round == rnd``)."""
        if self.store:
            self._mut_preds[table].append(pred)

    def _touch_all(self, table: str) -> None:
        """Unbounded mutation (error reset, endpoint conversion): the
        next commit must rewrite ``table`` in full."""
        self._mut_rewritten[table] = True

    def _note_insert(self, table: str, n: int) -> None:
        """Exact count of rows APPENDED (guaranteed-new keys) since the
        last commit — keeps the upsert manifest's reconciled row count
        exact without an O(store) anti-join at commit time."""
        self._mut_inserts[table] += n

    def _commit(self, metrics: dict) -> None:
        full: dict[str, DataFrame] = {}
        cur_mut = {
            "resources": self.resources,
            "domains": self.domains,
            "paths": self.paths,
        }
        # append-only tables take Iceberg-style delta commits: write
        # ONLY the rows added since the last snapshot and chain the
        # manifest paths, so commit I/O scales with the round, not the
        # store. Fall back to a full write when existing rows were
        # rewritten (triple collision merge), when the chain is due for
        # compaction, or on the first commit. The proc ledgers dedup at
        # READ time (merge-on-read): a key re-extending in a later
        # round lands in that round's delta and compaction distincts —
        # the authoritative read surface (proc_triples property /
        # assert_match) was already distinct-at-read.
        compact = {
            "triples": lambda: self.triples,
            "trace": lambda: self.trace,
            "proc_triples": lambda: self._proc_triples_df.distinct()
            .orderBy("subject", "predicate", "object_kind",
                     "object_value", "object_datatype",
                     "object_language"),
            "proc_done_resources":
                lambda: self._proc_done_df.distinct().orderBy("url"),
        }
        prev_rnd = self.store.latest_round()
        prev = self.store.read_manifest(prev_rnd) \
            if prev_rnd is not None else None
        # mutable tables take merge-on-read UPSERT deltas: write the
        # full new row for every key a mutation site touched this
        # round (O(round), not O(store)); readers reconcile
        # last-writer-wins per key. Fall back to a full rewrite on the
        # unbounded flips, at compaction, below the size gate, or on
        # the first commit — the exact mirror of the append gating.
        upserts: dict[str, tuple] = {}
        for name, key in self.MUT_KEYS.items():
            pinfo = (prev or {}).get("tables", {}).get(name)
            chain = len(self.store.table_paths(pinfo)) if pinfo else 0
            # the size gate only applies when the round actually
            # touched the table: an untouched table carries forward
            # with zero I/O whatever its size (mirrors the append
            # gate's `parts and small` — rewriting an unchanged table
            # in full because it is *small* was pure waste)
            touched = bool(self._mut_touched[name]
                           or self._mut_preds[name]
                           or self._mut_inserts[name])
            small = touched and ((pinfo or {}).get("rows", 0)
                                 < self.snapshot_upsert_min_rows)
            if (pinfo is None or self._mut_rewritten[name]
                    or chain >= self.snapshot_compact_chain or small):
                full[name] = cur_mut[name]
                continue
            parts: list[DataFrame] = []
            by_col: dict[str, list[DataFrame]] = {}
            for col, kdf in self._mut_touched[name]:
                by_col.setdefault(col, []).append(kdf.select(col))
            for col, kdfs in by_col.items():
                keys = kdfs[0]
                for extra in kdfs[1:]:
                    keys = keys.unionByName(extra)
                # round-bounded right side: AQE turns this into a
                # broadcast semi-join, so the table scans once with a
                # probe — no store-sized shuffle at commit time
                parts.append(cur_mut[name].join(
                    keys.distinct(), col, "left_semi"))
            for pred in self._mut_preds[name]:
                parts.append(cur_mut[name].filter(pred))
            if parts:
                delta = parts[0]
                for extra in parts[1:]:
                    delta = delta.unionByName(extra)
                # overlapping touched sets duplicate rows, never
                # conflicting values (all parts project the same
                # table) — any survivor per key is the row
                delta = delta.dropDuplicates([key])
            else:
                delta = None  # known-untouched: zero-I/O carry forward
            upserts[name] = (
                delta, key, pinfo["rows"] + self._mut_inserts[name])
        deltas: dict[str, DataFrame] = {}
        for name in self.DELTA_TABLES:
            pinfo = (prev or {}).get("tables", {}).get(name)
            chain = len(self.store.table_paths(pinfo)) if pinfo else 0
            parts = self._append_deltas[name]
            # below snapshot_delta_min_rows a full rewrite is cheaper
            # than the chain's fixed per-commit costs — but ONLY when
            # the table actually gained rows: an unchanged table must
            # still carry forward with zero I/O whatever its size
            small = ((pinfo or {}).get("rows", 0)
                     < self.snapshot_delta_min_rows)
            if (pinfo is None or self._append_rewritten[name]
                    or chain >= self.snapshot_compact_chain
                    or (parts and small)):
                full[name] = compact[name]()
                continue
            if not parts:
                # known-empty: carry forward with zero I/O AND zero
                # jobs (the pre-r5 empty-dir write still cost one
                # Spark job per quiet table per round)
                deltas[name] = None
                continue
            delta = parts[0]
            for p in parts[1:]:
                delta = delta.unionByName(p)
            if name in ("proc_triples", "proc_done_resources"):
                # key-sorted files compress ~2× better (measured 9.0 →
                # 5-ish MB on the megaround ledger delta); O(round) sort
                delta = delta.orderBy(*delta.columns)
            deltas[name] = delta
        self.store.commit(
            self.spark, self.round, full,
            metrics, self.seq_counter,
            steps=self._step_log,
            deltas=deltas,
            upserts=upserts,
            prev_manifest=prev,
            # Iceberg bucket(n, key)-style hash partitioning for the
            # big tables (north rule: salted domain/url-hash-partitioned
            # frontier state); per-bucket row counts go to the manifest
            bucket_by={
                "resources": ("url", 16),
                "paths": ("head_key", 16),
                "triples": ("subject", 16),
            },
        )
        self._flush_bloom()
        tables = self.store.load_tables(self.spark, self.round)
        if self.snapshot_validate_upserts and upserts:
            # test hook: the reconciled read surface must equal the
            # in-memory truth bit-for-bit — catches any mutation site
            # that forgot its _touch_* call (a missed touch is silent
            # corruption; a superset touch is merely redundant I/O)
            from pyspark.sql.types import MapType

            def _cmp_form(df: DataFrame) -> DataFrame:
                # exceptAll rejects MAP columns; entries arrays compare
                # fine and identical rows keep identical entry order
                return df.select(*[
                    F.map_entries(f.name).alias(f.name)
                    if isinstance(f.dataType, MapType) else f.name
                    for f in df.schema.fields])

            for name in upserts:
                mem, got = _cmp_form(cur_mut[name]), _cmp_form(tables[name])
                assert got.exceptAll(mem).count() == 0 \
                    and mem.exceptAll(got).count() == 0, \
                    f"upsert reconcile diverged for {name}"
        self.resources = tables["resources"]
        self.domains = tables["domains"]
        self.paths = tables["paths"]
        self.triples = tables["triples"]
        self._trace_df = tables["trace"]
        self._proc_triples_df = tables["proc_triples"]
        self._proc_done_df = tables["proc_done_resources"]
        self.ends = self.ends.localCheckpoint(eager=True)
        self._triples_dirty = False
        self._reset_delta_state()
        for c in self._wave_caches:
            c.unpersist()
        self._wave_caches = []

    def _checkpoint_local(self) -> None:
        """Lineage truncation when running without a snapshot store.
        The tables are independent, so their materialization jobs run
        concurrently (Spark's scheduler is thread-safe; on a real
        cluster these are the parallel MERGE commits of the round).

        triples/ends/trace/ledgers are append-only unions (flat data
        lineage), so they only need a checkpoint after the rare
        collision-merge rewrite (_merge_triples) — plus a periodic one
        every ``append_ckpt_every`` rounds to bound LOGICAL plan depth
        (each round appends a union node; over hundreds of rounds
        analysis time would grow linearly otherwise)."""
        from concurrent.futures import ThreadPoolExecutor

        self._flush_bloom()
        self._ckpt_calls += 1
        periodic = (self._ckpt_calls % self.append_ckpt_every) == 0
        tables = ["resources", "domains", "paths"]
        if self._triples_dirty or periodic:
            tables.append("triples")
        if periodic:
            tables.extend(["ends", "_trace_df",
                           "_proc_triples_df", "_proc_done_df"])
        with ThreadPoolExecutor(max_workers=len(tables)) as ex:
            futs = {
                t: ex.submit(getattr(self, t).localCheckpoint, eager=True)
                for t in tables
            }
            for t, fut in futs.items():
                setattr(self, t, fut.result())
        self._triples_dirty = False
        # no snapshot store ⇒ no delta commit will ever consume these;
        # drop them so checkpointed delta frames can be GC'd
        self._reset_delta_state()
        for c in self._wave_caches:
            c.unpersist()
        self._wave_caches = []

    def start_step(self, seeds: DataFrame | None = None,
                   config: CrawlConfig | None = None,
                   reset_errors: bool = False,
                   convert_to_endpoint: bool = False) -> None:
        """Begin a new process step (Process.startNext,
        models/src/Process/Process.ts:412-493): optional error reset,
        re-extension of done-headed active paths under the NEW limits,
        optional traversal→endpoint conversion, then seed insertion
        (Resource.insertSeeds: traversal seeds always create a fresh
        length-1 path; endpoint seeds only when no endpoint path exists
        for that head). Changing path_type requires
        ``convert_to_endpoint=True`` (reference: curPathType only flips
        through the conversion flow)."""
        assert self.paths is not None, "bootstrap or resume first"
        if config is not None:
            self.cfg = config
        if reset_errors:
            self.reset_errored_states()
        if convert_to_endpoint:
            self.convert_to_endpoint()
        else:
            # done-headed active paths re-extend under the new limits;
            # the done probe is a semi-join against the resources table
            # and the head set stays a DATAFRAME all the way into the
            # extension cascade — a frontier-scale step transition never
            # materializes its head set on the driver
            done_heads = (
                self.paths.filter(
                    (F.col("status") == "active")
                    & (F.col("head_kind") == "url"))
                .select("head_url").distinct()
                .join(self.resources.filter(F.col("status") == "done")
                      .select(F.col("url").alias("head_url")),
                      "head_url", "left_semi")
                .localCheckpoint(eager=False))
            if done_heads.count():  # materializes the lazy checkpoint
                if self.cfg.path_type == "endpoint":
                    self._extend_endpoint(self.round, done_heads)
                else:
                    self._extend(self.round, done_heads)
        step_seeds: list[str] = []
        if seeds is not None:
            step_seeds = self._insert_seed_paths(seeds)
        self._record_step(step_seeds)
        if self.store:
            self._commit({"phase": "start_step"})
        else:
            self._checkpoint_local()

    def _insert_seed_paths(self, seeds: DataFrame) -> list[str]:
        """Additive seed insertion into a live crawl (Resource.ts
        insertSeeds/insertSeedPaths; contrast bootstrap, which creates
        the tables from scratch)."""
        w = Window.orderBy("file_order")
        seed_rows = (
            seeds.coalesce(1)
            .withColumn("file_order", F.monotonically_increasing_id())
            .withColumn("url", udfs.canonicalize_url(F.col("url")))
            .filter(F.col("url").isNotNull())
            .groupBy("url").agg(F.min("file_order").alias("file_order"))
            .withColumn("rk", F.row_number().over(w))
            .drop("file_order")
        ).collect()
        seed_urls = [r["url"] for r in sorted(seed_rows,
                                              key=lambda r: r["rk"])]
        if seed_urls:
            # unseen seeds are filtered by _insert_new_urls' anti-join
            self._insert_new_urls(self.spark.createDataFrame(
                [(u,) for u in seed_urls], "url string"))
        if self.cfg.path_type == "endpoint":
            # endpoint seeds only create a path when no path exists for
            # that head (Resource.insertSeeds) — an anti-join of the
            # TINY seed list against the frontier's url heads: the
            # frontier-scale head set never reaches the driver, only
            # the O(seed list) survivors do (seqs follow seed order,
            # same as the reference's insert order)
            rows = []
            if seed_urls:
                seeds_df = self.spark.createDataFrame(
                    [(u,) for u in seed_urls], "head_url string")
                heads = (self.paths.filter(F.col("head_kind") == "url")
                         .select("head_url"))
                new_seeds = {
                    r["head_url"] for r in
                    F.broadcast(seeds_df)
                    .join(heads, "head_url", "left_anti")
                    .distinct().collect()}  # O(seed list)
                for u in seed_urls:
                    if u not in new_seeds:
                        continue
                    rows.append(("", u, "url", u, [], [], 1, "active",
                                 self.round, self.seq_counter, {u: 1}))
                    self.seq_counter += 1
        else:
            rows = []
            for u in seed_urls:
                rows.append((u, u, "url", u, [u], [], 1, "active",
                             self.round, self.seq_counter, None))
                self.seq_counter += 1
        if rows:
            seed_df = self.spark.createDataFrame(rows, schemas.PATHS)
            self.paths = self.paths.unionByName(seed_df)
            self._touch_keys("paths", "seq", seed_df)
            self._note_insert("paths", len(rows))
        return seed_urls

    def reset_errored_states(self) -> None:
        """Error resets (resetErrors step flag, Process.ts:562-664):
        errored resources revert to unvisited (re-schedulable), errored
        host-not-found domains revert to unvisited (robots re-checked).
        No URL leaves the seen-set, so the Bloom filter stays exact —
        true deletion semantics would swap in the CuckooFilter
        (operators/seen_set.py), which supports removal."""
        # the errored set is unbounded (O(store) in the worst case) —
        # the next snapshot rewrites these tables in full
        self._touch_all("resources")
        self.resources = self.resources.withColumn(
            "status",
            F.when(F.col("status") == "error", F.lit("unvisited"))
            .otherwise(F.col("status")))
        # only the COUNT of errored domains reaches the driver (the
        # unvisited counter needs it); the reset itself is a pure
        # column transform — a 10^8-domain dimension never materializes
        n_err = self.domains.filter(F.col("status") == "error").count()
        if n_err:
            self._touch_all("domains")
            is_err = F.col("status") == "error"
            self.domains = self.domains.select(
                "origin",
                F.when(is_err, F.lit("unvisited"))
                .otherwise(F.col("status")).alias("status"),
                F.when(is_err, F.lit(None).cast("string"))
                .otherwise(F.col("robots_status")).alias("robots_status"),
                F.when(is_err, F.lit(""))
                .otherwise(F.col("robots_txt")).alias("robots_txt"),
                F.when(is_err, F.lit(self.cfg.default_crawl_delay))
                .otherwise(F.col("crawl_delay")).cast("int")
                .alias("crawl_delay"),
                F.when(is_err, F.lit(0))
                .otherwise(F.col("next_allowed")).cast("int")
                .alias("next_allowed"),
                # warning history survives the reset (the reference
                # never clears warnings/lastWarnings)
                "warnings", "last_warnings",
            )
            self._unvisited_domains += n_err
        if self.store:
            self._commit({"phase": "reset_errors"})
        else:
            self._checkpoint_local()

    # ------------------------------------------------------------------
    # per-round pieces
    # ------------------------------------------------------------------
    def _eligible_paths(self) -> DataFrame:
        """Frontier eligibility (SURVEY §2.2): active url-head paths
        within bounds whose head resource is unvisited; origin attached
        from the seen-set. Domain state is joined by the callers."""
        res = self.resources.select(
            F.col("url").alias("head_url"),
            F.col("origin"),
            F.col("status").alias("res_status"),
        )
        base = self.paths.filter(
            (F.col("status") == "active")
            & (F.col("head_kind") == "url")
            & (F.col("length") < self.cfg.max_path_length)
            & (F.size("predicates") <= self.cfg.max_path_props)
        )
        base = self._step_path_filter(base)
        return (
            base
            .join(res, "head_url")
            .filter(F.col("res_status") == "unvisited")
            .select("head_url", "origin", "length", "created_round", "seq")
        )

    def _step_path_filter(self, df: DataFrame) -> DataFrame:
        """Scheduling-side predicate-limitation filters
        (genTraversalPathQuery, process-paths.ts:791-866): past rules
        bind regardless of fullness with no label exemption; future
        rules bind only FULL paths. Pattern evaluation happens once
        against the small distinct-predicate vocabulary (this engine
        unifies the reference's exact-match query layer with its
        pattern-matched per-triple layer on the pattern semantics —
        same documented deviation as the oracle's _step_query_ok)."""
        lims = self.cfg.pred_limitations
        if not lims or self.cfg.path_type == "endpoint":
            return df
        lim = self.cfg.pred_vocab_limit
        rows = (df.select(F.explode("predicates").alias("p"))
                .distinct().limit(lim + 1).collect())
        if len(rows) > lim:
            return self._step_path_filter_distributed(df, lims)
        vocab = [r["p"] for r in rows]

        def matched(kind: str) -> list[str]:
            pats = [l.predicate for l in lims if kind in l.lims]
            return sorted(
                w for w in vocab
                if any(matches_predicate_pattern(p, w) for p in pats))

        has = {k: any(k in l.lims for l in lims)
               for k in ("require-past", "disallow-past",
                         "require-future", "disallow-future")}
        cond = F.lit(True)
        if has["require-future"] or has["disallow-future"]:
            if has["require-future"]:
                rf = matched("require-future")
                full_ok = (F.exists("predicates", lambda q: q.isin(rf))
                           if rf else F.lit(False))
            else:
                dfu = matched("disallow-future")
                full_ok = (F.exists("predicates", lambda q: ~q.isin(dfu))
                           if dfu else F.lit(True))
            cond = cond & (
                (F.size("predicates") < self.cfg.max_path_props) | full_ok)
        if has["disallow-past"]:
            dp = matched("disallow-past")
            if dp:
                cond = cond & ~F.exists("predicates",
                                        lambda q: q.isin(dp))
        if has["require-past"]:
            rp = matched("require-past")
            cond = cond & F.forall(
                "predicates",
                (lambda q: q.isin(rp)) if rp else (lambda q: F.lit(False)))
        return df.filter(cond)

    def _step_path_filter_distributed(self, df: DataFrame,
                                      lims) -> DataFrame:
        """Above-``pred_vocab_limit`` regime of ``_step_path_filter``:
        the same exists/forall semantics evaluated per path by one
        vectorized array UDF (matched-set membership ≡
        matches-any-pattern element-wise; empty-array behavior
        mirrors exists→False / forall→True, with the documented
        max_path_props=0 corner unchanged).

        Accepted deviation (unreachable under supported configs,
        which require ``max_path_props >= 1``): a FULL path whose
        predicates array is EMPTY — possible only when
        ``max_path_props <= 0`` — under disallow-future patterns that
        match no vocabulary word is KEPT by the fast path (its
        empty-matched-set shortcut is ``lit(True)``) but DROPPED here
        (``size>0 & ~all_dfu`` is False), which is the strict
        exists-semantics answer. Likewise NULL predicate elements
        (never produced by the parser — TRIPLES columns are non-null)
        differ: ``isin`` drops them, the pandas matcher keeps them.
        Both corners sit outside the engine's input domain; the
        config sweep pins the two regimes equal everywhere inside
        it (tests/test_config_sweep.py)."""
        def pats(kind):
            return tuple(l.predicate for l in lims if kind in l.lims)

        has = {k: any(k in l.lims for l in lims)
               for k in ("require-past", "disallow-past",
                         "require-future", "disallow-future")}
        st = udfs.make_step_pred_stats(
            pats("require-future"), pats("disallow-future"),
            pats("disallow-past"), pats("require-past"),
        )(F.col("predicates"))
        df = df.withColumn("_ps", st)
        cond = F.lit(True)
        if has["require-future"] or has["disallow-future"]:
            # full paths only: exists(match rf) / exists(not match dfu)
            full_ok = F.col("_ps.any_rf") if has["require-future"] \
                else (F.size("predicates") > 0) & ~F.col("_ps.all_dfu")
            cond = cond & (
                (F.size("predicates") < self.cfg.max_path_props)
                | full_ok)
        if has["disallow-past"]:
            cond = cond & ~F.col("_ps.any_dp")
        if has["require-past"]:
            cond = cond & F.col("_ps.all_rp")
        return df.filter(cond).drop("_ps")

    def _phase_robots(self, rnd: int, eligible: DataFrame) -> int:
        """Robots checks for unvisited domains with eligible paths.
        Returns the number of domains checked; updates self.domains.

        Fully distributed: the per-domain updates stay a (checkpointed)
        DataFrame merged into ``domains`` via a gated join — only the
        checked/errored COUNTS reach the driver, so a discovery-heavy
        mega-round (10^6+ new domains) scales with executors instead of
        collecting one row per unvisited domain (VERDICT r3 #3).
        Broadcast hints on the domains/robots dimensions are size-gated
        (``_maybe_bcast``) on their tracked row counts."""
        if self._unvisited_domains == 0:
            return 0  # no job at all on settled rounds
        if self._n_robots is None:
            self._n_robots = self.robots.count()  # static dim, once
        dom = self.domains.select(
            "origin", F.col("status").alias("dom_status"))
        cand = (
            eligible.join(self._maybe_bcast(dom, self._n_domains),
                          "origin")
            .filter(F.col("dom_status") == "unvisited")
            .select("origin").distinct()
        )
        info = cand.join(self._maybe_bcast(self.robots, self._n_robots),
                         "origin", "left")
        delay_ok = self._robots_delay(F.col("robots_txt"))
        updates = info.select(
            "origin",
            F.coalesce(F.col("status"), F.lit("not_found"))
             .alias("new_robots_status"),
            F.when(F.col("status") == "ok", F.col("robots_txt"))
             .otherwise(F.lit("")).alias("new_robots_txt"),
            F.when(
                F.col("status") == "ok",
                F.coalesce(delay_ok.cast("int"),
                           F.lit(self.cfg.default_crawl_delay)),
            ).otherwise(F.lit(self.cfg.default_crawl_delay))
             .alias("new_crawl_delay"),
        ).withColumn(
            "new_dom_status",
            F.when(F.col("new_robots_status") == "host_not_found",
                   F.lit("error")).otherwise(F.lit("ready")),
        ).withColumn(
            # error domains are never admitted, so their politeness
            # clock is untouched (oracle: host_not_found → continue)
            "new_next_allowed",
            F.when(F.col("new_dom_status") == "error", F.lit(None))
            .otherwise(F.lit(rnd) + F.col("new_crawl_delay")),
        )
        # one materialization job; only counts cross to the driver
        updates = updates.localCheckpoint(eager=False)
        n_checked = updates.count()  # one job: materialize + count
        if n_checked:
            self._unvisited_domains -= n_checked
            # checked origins are schedule-bounded; `updates` is
            # checkpointed, so the commit-time key probe is free
            self._touch_keys("domains", "origin", updates)
            self.domains = (
                self.domains.join(
                    self._maybe_bcast(updates, n_checked),
                    "origin", "left")
                .select(
                    "origin",
                    F.coalesce("new_dom_status", "status").alias("status"),
                    F.coalesce("new_robots_status", "robots_status")
                     .alias("robots_status"),
                    F.coalesce("new_robots_txt", "robots_txt")
                     .alias("robots_txt"),
                    F.coalesce("new_crawl_delay", "crawl_delay")
                     .cast("int").alias("crawl_delay"),
                    F.coalesce("new_next_allowed", "next_allowed")
                     .cast("int").alias("next_allowed"),
                    "warnings", "last_warnings",
                )
            )
            # host_not_found robots → E_DOMAIN_NOT_FOUND warning
            # (Domain.ts:1026-1049) — built as an aggregation of the
            # checkpointed updates (cheap count; no per-domain rows)
            errs = updates.filter(F.col("new_dom_status") == "error")
            n_err = errs.count()
            if n_err:
                self._merge_domain_warnings_df(
                    errs.select(
                        "origin",
                        F.create_map(F.lit("E_DOMAIN_NOT_FOUND"),
                                     F.lit(1)).alias("w_inc"),
                        F.array(F.lit("E_DOMAIN_NOT_FOUND"))
                         .alias("lw_new")),
                    n_err)
        return n_checked

    def _merge_domain_warnings_df(self, wdf: DataFrame,
                                  n_rows: int) -> None:
        """Counter map union-add + last-10 ring append (Domain.ts:44-58;
        $inc warnings.* / $push lastWarnings $slice:-10). ``wdf``:
        (origin, w_inc map, lw_new array); broadcast hint gated on
        ``n_rows`` (a mega-round's warning set shuffles instead)."""
        self._touch_keys("domains", "origin", wdf)
        d = self.domains.join(self._maybe_bcast(wdf, n_rows),
                              "origin", "left")
        inc = F.coalesce(
            F.col("w_inc"), F.expr("cast(map() as map<string,int>)"))
        merged_w = F.map_zip_with(
            F.col("warnings"), inc,
            lambda k, a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)))
        lw_cat = F.concat(
            F.col("last_warnings"),
            F.coalesce(F.col("lw_new"),
                       F.expr("cast(array() as array<string>)")))
        self.domains = d.select(
            "origin", "status", "robots_status", "robots_txt",
            "crawl_delay", "next_allowed",
            merged_w.alias("warnings"),
            F.slice(lw_cat,
                    F.greatest(F.lit(1), F.size(lw_cat) - F.lit(9)),
                    F.lit(10)).alias("last_warnings"),
        )

    def _phase_schedule(self, rnd: int, eligible: DataFrame) -> list[Row]:
        """Priority ranking + per-domain top-k + politeness admission.

        Order = (length ASC, created_round ASC, seq ASC) — the
        reference's sort(nodes.count, createdAt, _id)
        (process-paths.ts:675-678). Per-domain budget = row_number over
        hash(origin) partitions ≤ resources_per_domain
        (Domain.ts:547-565 / config resourcesPerDomain).

        Returns the collected schedule — O(domains × budget) rows by
        construction, the round-synchronous driver contract."""
        dom = self.domains.select(
            "origin", F.col("status").alias("dom_status"),
            "next_allowed", "robots_txt")
        elig = (
            eligible.join(self._maybe_bcast(dom, self._n_domains),
                          "origin")
            .filter((F.col("dom_status") == "ready")
                    & (F.col("next_allowed") <= rnd))
        )
        url_best = elig.groupBy("head_url", "origin").agg(
            F.min(F.struct("length", "created_round", "seq")).alias("pr"),
            # robots_txt is functionally determined by origin — carrying
            # it through the agg saves a second domains join below
            F.first("robots_txt").alias("robots_txt"),
        )
        per_dom = Window.partitionBy("origin").orderBy("pr", "head_url")
        ranked = (
            url_best.withColumn("dom_rk", F.row_number().over(per_dom))
            .filter(F.col("dom_rk") <= self.cfg.resources_per_domain)
        )
        if self.cfg.round_budget_cap is not None:
            # bound the driver materialization: parallel top-k
            # (TakeOrderedAndProject) in priority order — a mega
            # frontier can never push more than the cap through collect
            ranked = ranked.orderBy("pr", "head_url").limit(
                self.cfg.round_budget_cap)
        # robots fetch-gate (Worker.ts:415-423) fused into the schedule
        # job: the vectorized matcher runs executor-side over the ranked
        # rows (robots_txt rode through the eligibility join + agg — no
        # second domains scan), so a mega-round's gate scales with cores
        # instead of single-threading the driver
        gate = ranked.withColumn(
            "allowed",
            self._robots_allows(
                F.coalesce(F.col("robots_txt"), F.lit("")),
                F.col("head_url")))
        # mega-domain skew spy surface: the per-domain top-k must plan
        # as WindowGroupLimit Partial+Final (map-side top-k per origin
        # BEFORE the shuffle), or a 10^8-URL domain funnels its whole
        # eligible set through the one reducer that owns its hash
        # (tests/test_broadcast_gate.py pins this on the round plan)
        self._last_schedule_df = gate
        rows = gate.select("head_url", "origin", "pr", "allowed").collect()
        rows.sort(key=lambda r: (tuple(r["pr"]), r["head_url"]))
        if self.cfg.round_domain_limit is not None:
            kept: list[str] = []
            for r in rows:
                if r["origin"] not in kept:
                    kept.append(r["origin"])
            allowed = set(kept[: self.cfg.round_domain_limit])
            rows = [r for r in rows if r["origin"] in allowed]
        return rows

    def _phase_fetch(self, rnd: int, sched_rows: list[Row]):
        """Fetch = join of scheduled frontier vs pages (the sandbox
        substitute for HTTP GET, Worker.ts:697-728).

        Returns (trace_tuples, quads_df). The robots gate already ran
        executor-side inside the schedule job (``allowed`` rides on the
        rows); text extraction and triple parsing are Arrow UDFs on
        executors — the driver only routes the schedule-bounded rows."""
        trace: list[tuple] = []
        attempted: list[tuple[str, str]] = []  # (url, origin)
        for rseq, r in enumerate(sched_rows):
            url, origin = r["head_url"], r["origin"]
            if not r["allowed"]:
                trace.append((rnd, rseq, url, origin, "error:disallowed"))
            else:
                attempted.append((url, origin, rseq))
        resolved_pairs: list[tuple[str, str]] = []
        cached_quads: DataFrame | None = None
        hit_status: dict[str, str] = {}
        if attempted:
            # triple-cache fetch-skip (Worker.ts:340-379, used :425-440):
            # a scheduled URL already present in the triple store's
            # source sets skips the pages join entirely; its cached
            # triples are re-submitted verbatim (already namespaced and
            # validity-filtered — they bypass the parse pipeline below).
            # One broadcast semi-scan of the store per round — the same
            # MERGE-scan cost shape as _merge_triples.
            hits: set[str] = set()
            if self._store_nonempty:
                # (an empty store can't have cache hits; skip the probe
                # job until the first merge)
                att_urls = self.spark.createDataFrame(
                    [(u,) for (u, _, _) in attempted], "url string")
                if self._source_bloom is not None:
                    # source-URL Bloom pre-pass: the schedule is round-
                    # bounded (tiny probe job against the broadcast
                    # word array), and a schedule that never re-visits
                    # a triple source — the common case — skips the
                    # O(store) explode scan entirely. False positives
                    # ride into the exact semi-join below
                    att_urls = att_urls.filter(
                        self._source_bloom.might_contain(F.col("url"))
                    ).localCheckpoint(eager=False)
                    n_maybe_hit = att_urls.count()
                else:
                    n_maybe_hit = len(attempted)
                if n_maybe_hit:
                    src_exp = self.triples.select(
                        F.explode("sources").alias("url"))
                    hits = {
                        r["url"] for r in src_exp.join(
                            F.broadcast(att_urls), "url", "left_semi")
                        .distinct().collect()
                    }
            if hits:
                hit_status = {u: "done" for u in hits}
                hit_df = self.spark.createDataFrame(
                    [(u,) for u in sorted(hits)], "source string")
                cached_quads = (
                    self.triples
                    .select(F.explode("sources").alias("source"),
                            "subject", "predicate", "object_kind",
                            "object_value", "object_datatype",
                            "object_language")
                    .join(self._maybe_bcast(hit_df, len(hits)), "source")
                )
                attempted_miss = [(u, o, r) for (u, o, r) in attempted
                                  if u not in hits]
            else:
                attempted_miss = attempted
        else:
            attempted_miss = []
        if attempted_miss:
            att_df = self.spark.createDataFrame(
                attempted_miss, "url string, origin string, rseq int")
            found = self.pages.join(F.broadcast(att_df), "url").select(
                "url", "origin", "rseq",
                udfs.extract_text(F.col("html")).alias("extracted_text"),
                udfs.parse_page_triples(F.col("html")).alias("raw_triples"),
                udfs.has_rdf_content(F.col("html")).alias("has_rdf"),
                udfs.alternate_url(F.col("html")).alias("alt_url"),
            )
            found.cache()
            self._found_cache = found  # unpersisted at round end
            meta = {
                r["url"]: (r["has_rdf"], r["alt_url"])
                for r in found.select("url", "has_rdf", "alt_url").collect()
            }
            # alternate-URL redirect resolution (Worker.ts:744-766):
            # wrong-MIME pages chase their RDF alternate link, one
            # batched pages-join per hop (≤ max_redirects hops total
            # for the whole round, not per URL)
            status_by_url: dict[str, str] = dict(hit_status)
            pending: list[tuple[str, str, int]] = []
            for url, origin, rseq in attempted_miss:
                m = meta.get(url)
                if m is None:
                    status_by_url[url] = "error:not_found"
                elif m[0]:
                    status_by_url[url] = "done"
                else:
                    st, nxt = self._redirect_step(m[1], 0)
                    if st is not None:
                        status_by_url[url] = st
                    else:
                        pending.append((url, nxt, 1))
            resolved_pairs = self._resolve_alternates(pending, status_by_url)
            for url, origin, rseq in attempted:
                trace.append((rnd, rseq, url, origin, status_by_url[url]))
        else:
            found = None
            for url, origin, rseq in attempted:
                trace.append((rnd, rseq, url, origin, hit_status[url]))
        trace.sort(key=lambda t: t[1])

        quads = None
        if found is not None:
            q = (
                found.select(F.col("url").alias("source"),
                             F.explode("raw_triples").alias("t"))
                .select("source", "t.*")
            )
            if resolved_pairs:
                # triples parsed from the resolved alternate pages are
                # attributed to the ORIGINAL scheduled URL (the crawl
                # result's url in the reference, Worker.ts:385-470)
                map_df = self.spark.createDataFrame(
                    resolved_pairs, "alt_url string, source string")
                q_alt = (
                    self.pages
                    .select(F.col("url").alias("alt_url"), "html")
                    .join(F.broadcast(map_df), "alt_url")
                    .select(
                        "source",
                        F.explode(udfs.parse_page_triples(
                            F.col("html"))).alias("t"))
                    .select("source", "t.*")
                )
                q = q.unionByName(q_alt)
            subj_is_blank = F.col("subject").startswith("_:")
            obj_is_blank = F.col("object_kind") == "blank"
            q = q.filter(F.col("object_value") != "")
            if self.cfg.allow_blank_nodes:
                q = q.withColumn(
                    "subject",
                    F.when(subj_is_blank, udfs.blank_node_ns(
                        F.col("source"), F.col("subject")))
                    .otherwise(F.col("subject")),
                ).withColumn(
                    "object_value",
                    F.when(obj_is_blank, udfs.blank_node_ns(
                        F.col("source"), F.col("object_value")))
                    .otherwise(F.col("object_value")),
                )
            else:
                q = q.filter(~subj_is_blank & ~obj_is_blank)
            quads = q
        if cached_quads is not None:
            quads = (quads.unionByName(cached_quads)
                     if quads is not None else cached_quads)
        return trace, quads

    def _redirect_step(self, alt: str | None, redirect: int):
        """One wrong-MIME decision (handleHttpResponse, Worker.ts:744-760):
        no alternate link → MIME error; hop budget spent → too many
        redirects; else follow. Returns (terminal_status|None, next_url)."""
        if alt is None:
            return "error:mime", None
        if redirect >= self.cfg.max_redirects:
            return "error:too_many_redirects", None
        return None, alt

    def _resolve_alternates(self, pending: list[tuple[str, str, int]],
                            status_by_url: dict[str, str]
                            ) -> list[tuple[str, str]]:
        """Chase alternate-link chains for all pending URLs at once —
        one broadcast pages-join per hop level (the reference recurses
        per fetch, getHttpContent, Worker.ts:764; batching the hop level
        keeps the job count bounded by max_redirects per round).

        Mutates ``status_by_url`` with terminal statuses and returns
        ``(final_alt_url, original_url)`` pairs for resolved chains."""
        resolved: list[tuple[str, str]] = []
        while pending:
            alts = sorted({a for (_, a, _) in pending})
            alt_df = self.spark.createDataFrame(
                [(a,) for a in alts], "alt_url string")
            rows = (
                self.pages.select(F.col("url").alias("alt_url"), "html")
                .join(F.broadcast(alt_df), "alt_url")
                .select(
                    "alt_url",
                    udfs.has_rdf_content(F.col("html")).alias("has_rdf"),
                    udfs.alternate_url(F.col("html")).alias("next_alt"))
                .collect()
            )
            meta = {r["alt_url"]: (r["has_rdf"], r["next_alt"])
                    for r in rows}
            nxt: list[tuple[str, str, int]] = []
            for orig, alt, redirect in pending:
                m = meta.get(alt)
                if m is None:
                    status_by_url[orig] = "error:not_found"
                elif m[0]:
                    status_by_url[orig] = "done"
                    resolved.append((alt, orig))
                else:
                    st, nxt_alt = self._redirect_step(m[1], redirect)
                    if st is not None:
                        status_by_url[orig] = st
                    else:
                        nxt.append((orig, nxt_alt, redirect + 1))
            pending = nxt
        return resolved

    def _ledger_commit(self, keys: DataFrame) -> None:
        """Append a cascade's proc-triple keys (columns = RAW_TRIPLE with
        datatype/language already ''-normalized) to the processTriples
        ledger, and their CURRENT sources to processDoneResources —
        "sources as of extension time": later sources do not
        retroactively appear (insertProcTriples / insertProcDoneRes,
        process-paths.ts:874-977). Both ledgers stay distributed; the
        source resolution is one store join per cascade (the same
        MERGE-scan cost shape as _merge_triples)."""
        kcols = ["subject", "predicate", "object_kind", "object_value",
                 "object_datatype", "object_language"]
        # lazy checkpoint: the src job below contains keys' plan, so
        # its (eager) materialization computes AND checkpoints keys in
        # the same job — one ledger job per cascade instead of two.
        # Every call site runs the src job unconditionally, so keys is
        # always materialized before any later-round consumer sees it
        keys = keys.distinct().localCheckpoint(eager=False)
        self._proc_triples_df = self._proc_triples_df.unionByName(keys)
        self._append_deltas["proc_triples"].append(keys)
        norm = self.triples.select(
            "subject", "predicate", "object_kind", "object_value",
            F.coalesce("object_datatype", F.lit(""))
             .alias("object_datatype"),
            F.coalesce("object_language", F.lit(""))
             .alias("object_language"),
            "sources")
        src = (
            norm.join(keys, kcols, "left_semi")
            .select(F.explode("sources").alias("url"))
            .distinct()
            # eager: freezes "as of extension time" against the current
            # store and keeps the ledger plan flat
            .localCheckpoint(eager=True)
        )
        self._proc_done_df = self._proc_done_df.unionByName(src)
        self._append_deltas["proc_done_resources"].append(src)

    def _maybe_bcast(self, df: DataFrame, n_keys: int,
                     limit: int | None = None) -> DataFrame:
        """Broadcast hint only under ``cfg.broadcast_key_limit`` (or an
        explicit ``limit`` for fat-row sides): an explicit hint
        bypasses AQE's size-based join choice, so a mega-round side
        would sail past the 8 GB broadcast hard limit. Above the gate
        the hint is dropped and the join shuffles on the key — the
        bucketed MERGE shape the storage layer already writes
        (storage.py bucketed tables)."""
        if n_keys <= (self.cfg.broadcast_key_limit
                      if limit is None else limit):
            return F.broadcast(df)
        return df

    def _merge_triples(self, quads: DataFrame) -> None:
        """Per-page dedup + MERGE into the triple store with source-set
        union (Triple.ts:79-232; sources $addToSet → array_distinct).

        Fully distributed MERGE INTO shape — no triple ever reaches the
        driver: the round's deduped triples are checkpointed once, the
        colliding keys (already present in the store — a triple
        re-extracted from another page) are found with a semi-join
        against the store (broadcast under the size gate, shuffled on
        the bucketed key above it), fresh keys APPEND (no shuffle, no
        re-aggregation of the store), and only collisions take the
        merge join. The edge view gains the fresh rows' edges as a
        distributed projection (_ends_of)."""
        import time as _time
        prof = self._last_ingest_profile
        key = TRIPLE_KEY
        _p0 = _time.time()
        nt = quads.groupBy(*key).agg(
            F.sort_array(F.collect_set("source")).alias("sources")
        ).localCheckpoint(eager=False)  # O(round's new keys)
        n_new = nt.count()  # ONE job: materialize the checkpoint + count
        prof["dedup_s"] = round(_time.time() - _p0, 2)
        prof["n_new_keys"] = n_new
        _p0 = _time.time()

        def nullsafe_cond(left, right):
            cond = None
            for c in key:
                e = left[c].eqNullSafe(right[c])
                cond = e if cond is None else (cond & e)
            return cond

        nt_keys = nt.select(*key)
        n_probe = n_new
        if self._triple_bloom is not None:
            # Bloom pre-pass over the round's keys: misses are
            # definitely-fresh APPENDs, so when nothing maybe-collides
            # the O(store) MERGE target scan is skipped entirely — the
            # common case of a frontier fanning into new territory.
            # False positives just ride into the exact semi-join below
            nt_keys = nt_keys.filter(
                self._triple_bloom.might_contain(*key)
            ).localCheckpoint(eager=False)
            n_probe = nt_keys.count()
            prof["n_maybe_coll"] = n_probe
        if n_probe == 0:
            coll_keys = nt_keys  # empty — nothing to scan for
            n_coll = 0
        else:
            coll_keys = self.triples.select(*key).join(
                self._maybe_bcast(nt_keys, n_probe),
                nullsafe_cond(self.triples, nt_keys),
                "left_semi"
            ).localCheckpoint(eager=False)  # the MERGE target scan
            n_coll = coll_keys.count()
        prof["coll_scan_s"] = round(_time.time() - _p0, 2)
        prof["n_coll"] = n_coll
        if n_coll:
            upd = nt.join(
                self._maybe_bcast(coll_keys, n_coll),
                nullsafe_cond(nt, coll_keys),
                "left_semi"
            ).withColumnRenamed("sources", "new_sources")
            cond = nullsafe_cond(self.triples, upd)
            self.triples = (
                self.triples.join(
                    self._maybe_bcast(upd, n_coll), cond, "left")
                .select(
                    *[self.triples[c] for c in key],
                    F.when(
                        F.col("new_sources").isNotNull(),
                        F.sort_array(F.array_distinct(F.concat(
                            self.triples["sources"],
                            F.col("new_sources")))))
                    .otherwise(self.triples["sources"]).alias("sources"))
            )
            self._triples_dirty = True
        if n_coll:
            fresh = nt.join(
                self._maybe_bcast(coll_keys, n_coll),
                nullsafe_cond(nt, coll_keys),
                "left_anti")
        else:
            fresh = nt  # every key was new — pure append
        self.triples = self.triples.unionByName(fresh)
        self.ends = self.ends.unionByName(self._ends_of(fresh))
        # delta-commit accounting: fresh keys ride the next snapshot's
        # append delta; a collision merge rewrote existing rows, which
        # forces that snapshot back to a full triples write
        self._append_deltas["triples"].append(fresh)
        if n_coll:
            self._append_rewritten["triples"] = True
        self._store_nonempty = True
        # queue the round's keys+sources for the store filters' fold at
        # checkpoint time (nt covers fresh ∪ collisions; re-adding a
        # present key is an idempotent OR)
        self._pending_store_bloom.append(nt)

    def _discover_urls(self, quads: DataFrame) -> None:
        """New-URL discovery (Resource.addFromTriples,
        manager/src/lib/Manager.ts:352-410): named nodes → raw-node
        DISTINCT (nodes repeat across triples — object URIs especially;
        dedup is a JVM shuffle, parsing is Python) → ONE fused
        canonicalize+origin parse per distinct node → canonical
        distinct → seen-set anti-join (Bloom pre-pass) → insert."""
        import time as _time
        co = udfs.canonicalize_with_origin(F.col("node"))
        nodes = (
            quads.select(F.col("subject").alias("node"))
            .unionByName(quads.filter(F.col("object_kind") == "uri")
                         .select(F.col("object_value").alias("node")))
            .filter(~F.col("node").startswith("_:"))
            .distinct()
            .select(co.alias("co"))
            .filter(F.col("co.url").isNotNull())
            .select("co.url", "co.origin").distinct()
        )
        if os.environ.get("DERZIS_INGEST_PROFILE"):
            _stages = {}
            _s0 = _time.time()
            raw = (quads.select(F.col("subject").alias("node"))
                   .unionByName(
                       quads.filter(F.col("object_kind") == "uri")
                       .select(F.col("object_value").alias("node")))
                   .filter(~F.col("node").startswith("_:"))
                   .distinct().localCheckpoint(eager=False))
            n_raw = raw.count()
            _stages["scan_distinct_s"] = round(_time.time() - _s0, 2)
            _s0 = _time.time()
            canon = (raw.select(co.alias("co"))
                     .filter(F.col("co.url").isNotNull())
                     .select("co.url", "co.origin").distinct()
                     .localCheckpoint(eager=False))
            n_canon = canon.count()
            _stages["canon_s"] = round(_time.time() - _s0, 2)
            _s0 = _time.time()
            if self._bloom is not None:
                probed = canon.withColumn(
                    "_m", self._bloom.might_contain(F.col("url"))
                ).localCheckpoint(eager=False)
                n_maybe = probed.filter(F.col("_m")).count()
                _stages["probe_s"] = round(_time.time() - _s0, 2)
                _s0 = _time.time()
                anti = (probed.filter(F.col("_m")).drop("_m")
                        .join(self.resources.select("url"), "url",
                              "left_anti").localCheckpoint(eager=False))
                anti.count()
                _stages["anti_s"] = round(_time.time() - _s0, 2)
                _stages["n_maybe"] = n_maybe
            _stages.update(n_raw_distinct=n_raw, n_canon=n_canon)
            self._last_ingest_profile["stages"] = _stages
        _p0 = _time.time()
        n = self._insert_new_urls(nodes, use_bloom=True, has_origin=True)
        self._last_ingest_profile["discover_s"] = round(
            _time.time() - _p0, 2)
        self._last_ingest_profile["n_discovered"] = n
        self._last_ingest_profile.update(
            {f"disc_{k}": v for k, v in self._last_insert_profile.items()})

    def _insert_new_urls(self, urls: DataFrame,
                         use_bloom: bool = False,
                         has_origin: bool = False) -> int:
        """Insert previously-unseen URLs into the seen-set; returns the
        number inserted. The anti-join is the scale path; the Bloom
        pre-pass (``use_bloom`` — the once-per-round discovery call,
        where the probe side is big) routes definitely-new URLs around
        it. Wave/seed calls skip it: their probes are small and the
        plain anti-join against the resources table (which includes all
        of this round's earlier unions) stays exact without paying a
        Bloom broadcast per call. Bloom maintenance is batched: new
        batches queue in ``_pending_bloom`` and fold into the filter
        executor-side (partial union) once per checkpoint, so the
        filter is always fresh w.r.t. every PREVIOUS round — exactly
        what the pre-pass's correctness needs. ``has_origin``: the
        caller already carries an ``origin`` column (the discovery
        path's fused canonicalize+origin parse) — skip the second
        URL-parse UDF here."""
        import time as _time
        iprof: dict = {}
        self._last_insert_profile = iprof
        _p0 = _time.time()
        if use_bloom and self.cfg.use_bloom and self._bloom is not None:
            # zero per-row-Python pre-pass: xxhash64 in codegen, then k
            # vectorized numpy probes per Arrow batch against the
            # broadcast-once word array (operators/seen_set.py)
            # materialize ONCE before branching: definitely_new and
            # maybe_seen both consume `flagged`, and without a
            # checkpoint the whole upstream (raw-node distinct →
            # canonicalize pandas pass → canonical distinct → Bloom
            # probe) is computed TWICE inside the insert's final
            # checkpoint job — the profiled fused pipeline cost MORE
            # than the sum of its stage-by-stage materializations
            # (bench-scale disc_ckpt ~3.5 s vs ~2.2 s staged; the
            # duplicated canonicalize pass is also the dominant
            # mega-round discover cost, BENCH/BASELINE.md §0.1)
            flagged = urls.withColumn(
                "_maybe_seen", self._bloom.might_contain(F.col("url"))
            ).localCheckpoint(eager=True)
            definitely_new = flagged.filter(
                ~F.col("_maybe_seen")).drop("_maybe_seen")
            maybe_seen = flagged.filter(
                F.col("_maybe_seen")).drop("_maybe_seen")
            genuinely_new = maybe_seen.join(
                self.resources.select("url"), "url", "left_anti")
            new_urls = definitely_new.unionByName(genuinely_new)
        else:
            new_urls = urls.join(
                self.resources.select("url"), "url", "left_anti")
        if not has_origin:
            new_urls = new_urls.withColumn(
                "origin", udfs.url_origin(F.col("url")))
        new_res = new_urls.select(
            "url", "origin", F.lit("unvisited").alias("status"),
            F.lit(None).cast("int").alias("crawl_round"),
            F.lit(None).cast("int").alias("crawl_counter"))
        # one materialization job tells us whether anything is new (the
        # common wave case is an empty insert — it pays one job either
        # way); counts on the checkpointed partitions are ~free
        new_res = new_res.localCheckpoint(eager=False)
        n = new_res.count()
        iprof["ckpt_s"] = round(_time.time() - _p0, 2)
        _p0 = _time.time()
        if n == 0:
            return 0
        self.resources = self.resources.unionByName(new_res)
        # anti-joined above ⇒ every new_res key is guaranteed new
        self._touch_keys("resources", "url", new_res)
        self._note_insert("resources", n)
        self._pending_bloom.append(new_res)
        # new-origin detection. Fast path (dimension under
        # origin_set_limit): the batch's distinct origins — a collect
        # HARD-BOUNDED by the gate via limit() — diff against the
        # driver mirror. Past the gate everything stays distributed:
        # anti-join against domains + a distributed union of the new
        # dimension rows; only the new-origin COUNT reaches the driver
        # (a single discovery round surfacing millions of new domains
        # must not build their rows driver-side — VERDICT r3 #4).
        lim = self.cfg.origin_set_limit
        new_origins: list[str] | None = None
        if self._known_origins is not None:
            org_rows = (new_res.select("origin").distinct()
                        .limit(lim + 1).collect())
            if len(org_rows) <= lim:
                batch_origins = {r["origin"] for r in org_rows}
                new_origins = sorted(batch_origins - self._known_origins)
                if (len(self._known_origins) + len(new_origins)) > lim:
                    # dimension outgrew the gate: this (bounded) batch
                    # still merges driver-side, the mirror is dropped
                    self._known_origins = None
            else:
                self._known_origins = None
        if new_origins is not None:
            if new_origins:
                dom_rows = self.spark.createDataFrame(
                    [(o, "unvisited", None, "",
                      self.cfg.default_crawl_delay, 0, {}, [])
                     for o in new_origins], schemas.DOMAINS)
                self.domains = self.domains.unionByName(dom_rows)
                self._touch_keys("domains", "origin", dom_rows)
                self._note_insert("domains", len(new_origins))
                if self._known_origins is not None:
                    self._known_origins.update(new_origins)
                self._unvisited_domains += len(new_origins)
                self._n_domains += len(new_origins)
        else:
            new_dom = (
                new_res.select("origin").distinct()
                .join(self.domains.select("origin"), "origin", "left_anti")
                .localCheckpoint(eager=False))
            n_new_org = new_dom.count()
            if n_new_org:
                self.domains = self.domains.unionByName(new_dom.select(
                    "origin",
                    F.lit("unvisited").alias("status"),
                    F.lit(None).cast("string").alias("robots_status"),
                    F.lit("").alias("robots_txt"),
                    F.lit(self.cfg.default_crawl_delay).cast("int")
                     .alias("crawl_delay"),
                    F.lit(0).cast("int").alias("next_allowed"),
                    F.expr("cast(map() as map<string,int>)")
                     .alias("warnings"),
                    F.expr("cast(array() as array<string>)")
                     .alias("last_warnings")))
                self._touch_keys("domains", "origin", new_dom)
                self._note_insert("domains", n_new_org)
                self._unvisited_domains += n_new_org
                self._n_domains += n_new_org
        iprof["origin_s"] = round(_time.time() - _p0, 2)
        return n

    def _flush_bloom(self) -> None:
        """Fold the checkpoint window's new-URL batches into the Bloom
        filter (executor-side partial sketch, bitwise union — the
        driver only ever holds the fixed-size bit array). With no
        filter built yet the batches are KEPT, not dropped: the
        eventual full build in ``run()`` supersedes them and clears the
        queue, and keeping them means any other future consumer stays
        correct without relying on that rebuild."""
        if self._pending_bloom and self._bloom is not None:
            batch = self._pending_bloom[0]
            for extra in self._pending_bloom[1:]:
                batch = batch.unionByName(extra)
            self._bloom.merge_from(batch, "url")
            self._pending_bloom = []
        # the store filters share one queue of (checkpointed) per-round
        # merged-triple batches: keys feed the triple filter, exploded
        # sources feed the source filter — two small fold jobs per
        # checkpoint window
        if self._pending_store_bloom and self._triple_bloom is not None:
            batch = self._pending_store_bloom[0]
            for extra in self._pending_store_bloom[1:]:
                batch = batch.unionByName(extra)
            self._triple_bloom.merge_from(batch, *TRIPLE_KEY)
            if self._source_bloom is not None:
                self._source_bloom.merge_from(
                    batch.select(F.explode("sources").alias("url")),
                    "url")
            self._pending_store_bloom = []

    # ------------------------------------------------------------------
    # path extension (TraversalPath.ts:219-399 as joins/windows)
    # ------------------------------------------------------------------
    def _ends_of(self, triples: DataFrame) -> DataFrame:
        """Explode a triples-shaped DataFrame into (end, direction)
        rows: the equi-join surface for path extension (SURVEY §2.3
        core join — nodes[] array membership becomes an exploded edge
        view). Applied to the whole store at resume and to each round's
        fresh rows incrementally."""
        t = triples.withColumn("node_key0", _object_key_col())
        fwd = t.select(
            F.col("subject").alias("end"),
            F.lit(0).alias("dir_rank"),
            F.col("predicate").alias("pred"),
            F.col("object_kind").alias("node_kind"),
            F.col("object_value").alias("node_raw"),
            F.col("node_key0").alias("node_key"),
            F.col("object_datatype").alias("t_dt"),
            F.col("object_language").alias("t_lang"),
        ).filter(
            ~((F.col("node_kind") == "uri") & (F.col("node_raw") == F.col("end")))
        )
        bwd = t.filter(
            (F.col("object_kind") == "uri")
            & (F.col("subject") != F.col("object_value"))
        ).select(
            F.col("object_value").alias("end"),
            F.lit(1).alias("dir_rank"),
            F.col("predicate").alias("pred"),
            F.lit("uri").alias("node_kind"),
            F.col("subject").alias("node_raw"),
            F.col("subject").alias("node_key"),
            F.lit(None).cast("string").alias("t_dt"),
            F.lit(None).cast("string").alias("t_lang"),
        )
        # canonicalize once here (cached for the round) so the per-wave
        # jobs stay whole-stage-codegen JVM plans with no Python UDF
        return fwd.unionByName(bwd).withColumn(
            "node_c",
            F.when(F.col("node_kind") == "uri",
                   udfs.canonicalize_url(F.col("node_raw")))
            .otherwise(F.col("node_raw")),
        )

    def _pred_limit_filter(self, cand: DataFrame) -> DataFrame:
        """Predicate allow/deny (genTraversalPathQuery semantics,
        process-paths.ts:791-866). Fast path (vocab ≤
        ``pred_vocab_limit``): patterns are evaluated once against the
        small distinct-predicate vocabulary, then applied as broadcast
        isin sets ($setIsSubset → F.forall). The vocab probes are
        ``limit(n+1).collect()`` so the driver never materializes more
        than the gate; past it (pathological generated-URI
        vocabularies) the patterns are evaluated per candidate row by
        vectorized pandas UDFs instead — no driver rows, no
        vocab-sized literal arrays in the plan."""
        lims = self.cfg.pred_limitations
        if not lims:
            return cand
        lim = self.cfg.pred_vocab_limit
        vocab_rows = (cand.select("pred").distinct()
                      .limit(lim + 1).collect())
        past_rows = (cand.select(F.explode("predicates").alias("p"))
                     .distinct().limit(lim + 1).collect())
        labels = set(LABEL_PREDICATES)
        req_future_pats = [l for l in lims if "require-future" in l.lims]
        req_past_pats = [l for l in lims if "require-past" in l.lims]
        is_label = F.col("pred").isin(list(labels))

        if len(vocab_rows) <= lim and len(past_rows) <= lim:
            vocab = [r["pred"] for r in vocab_rows]
            past_vocab = [r["p"] for r in past_rows]

            def matched(kind: str, words: list[str]) -> set[str]:
                pats = [l.predicate for l in lims if kind in l.lims]
                return {w for w in words
                        if any(matches_predicate_pattern(p, w)
                               for p in pats)}
            dis_future = matched("disallow-future", vocab)
            req_future = matched("require-future", vocab)
            dis_past = matched("disallow-past", past_vocab) - labels
            req_past = matched("require-past", past_vocab)

            # isExtensionAllowed (TraversalPath.ts:451-537): label
            # candidates are exempt from ALL limitations (:467-477);
            # others must pass the future rules AND the path's past
            # rules
            ok = ~F.col("pred").isin(list(dis_future)) \
                if dis_future else F.lit(True)
            if req_future_pats:
                ok = ok & F.col("pred").isin(list(req_future | labels))
            if dis_past:
                arr = F.array(*[F.lit(x) for x in sorted(dis_past)])
                ok = ok & ~F.exists(
                    "predicates", lambda p: F.array_contains(arr, p))
            if req_past_pats:
                allowed_past = sorted(req_past | labels)
                arr = F.array(*[F.lit(x) for x in allowed_past])
                ok = ok & F.forall(
                    "predicates", lambda p: F.array_contains(arr, p))
            return cand.filter(is_label | ok)

        # above-gate path: same semantics, evaluated distributively
        # (matched-set membership ≡ matches-any-pattern, so empty
        # matched sets fall out of the UDF returning all-False)
        def pats(kind):
            return tuple(l.predicate for l in lims if kind in l.lims)

        ok = F.lit(True)
        if pats("disallow-future"):
            ok = ok & ~udfs.make_pred_matcher(
                pats("disallow-future"))(F.col("pred"))
        if req_future_pats:
            ok = ok & (udfs.make_pred_matcher(
                pats("require-future"))(F.col("pred")) | is_label)
        dis_p, req_p = pats("disallow-past"), pats("require-past")
        if dis_p or req_past_pats:
            pc = udfs.make_past_pred_checks(
                dis_p, req_p, tuple(sorted(labels)))(F.col("predicates"))
            cand = cand.withColumn("_pc", pc)
            if dis_p:
                ok = ok & ~F.col("_pc.has_dis")
            if req_past_pats:
                ok = ok & F.col("_pc.all_req")
            return cand.filter(is_label | ok).drop("_pc")
        return cand.filter(is_label | ok)

    def _endpoint_pred_filter(self, df: DataFrame,
                              pred_col: str) -> DataFrame:
        """Endpoint-mode predicate gate (isExtensionAllowed,
        EndpointPath.ts:160-190: FUTURE limitations only, label preds
        exempt) — shared by the edge and blank-2-hop candidate paths.
        Same two-regime structure as ``_pred_limit_filter``: bounded
        vocab probe + driver literal sets below ``pred_vocab_limit``,
        vectorized pattern UDF above it."""
        lims = self.cfg.pred_limitations
        if not lims:
            return df
        lim = self.cfg.pred_vocab_limit
        labels = set(LABEL_PREDICATES)
        req_pats = [l.predicate for l in lims if "require-future" in l.lims]
        dis_pats = [l.predicate for l in lims
                    if "disallow-future" in l.lims]
        rows = (df.select(F.col(pred_col).alias("_p")).distinct()
                .limit(lim + 1).collect())
        if len(rows) <= lim:
            vocab = [r["_p"] for r in rows]
            req = {w for w in vocab if any(
                matches_predicate_pattern(p, w) for p in req_pats)}
            dis = {w for w in vocab if any(
                matches_predicate_pattern(p, w)
                for p in dis_pats)} - labels
            ok = F.lit(True)
            if req_pats:
                ok = F.col(pred_col).isin(sorted(req | labels))
            if dis:
                ok = ok & ~F.col(pred_col).isin(sorted(dis))
            return df.filter(ok)
        is_label = F.col(pred_col).isin(sorted(labels))
        ok = F.lit(True)
        if req_pats:
            ok = udfs.make_pred_matcher(
                tuple(req_pats))(F.col(pred_col)) | is_label
        if dis_pats:
            ok = ok & ~(udfs.make_pred_matcher(
                tuple(dis_pats))(F.col(pred_col)) & ~is_label)
        return df.filter(ok)

    def convert_to_endpoint(self) -> None:
        """convertToEndpointPaths (process-paths.ts:1640-1716), the
        engine mirror of the oracle's `convert_to_endpoint`: active
        traversal paths (seed_paths IS NULL) become endpoint candidates
        (spl = length, seedPaths={seed: length}), min-merged by head
        with existing endpoint rows; traversal rows are deleted; the
        engine continues under endpoint semantics."""
        from dataclasses import replace as dc_replace

        # every active traversal row flips — unbounded; full rewrite
        self._touch_all("paths")
        trav = self.paths.filter(
            (F.col("status") == "active") & F.col("seed_paths").isNull())

        def info(df, key_col):
            per_seed = df.groupBy(F.col(key_col).alias("gkey"), "seed") \
                .agg(F.min("length").cast("int").alias("minlen"))
            maps = per_seed.groupBy("gkey").agg(
                F.map_from_entries(F.sort_array(F.collect_list(
                    F.struct("seed", "minlen")))).alias("new_map"))
            dists = df.groupBy(F.col(key_col).alias("gkey")).agg(
                F.min("length").cast("int").alias("dist"))
            return dists.join(maps, "gkey")

        url_info = info(trav.filter(F.col("head_kind") == "url"),
                        "head_url").localCheckpoint(eager=False)
        lit_info = info(trav.filter(F.col("head_kind") == "literal"),
                        "head_key").localCheckpoint(eager=False)
        n_url = url_info.count()  # one job each: materialize + count
        n_lit = lit_info.count()
        # delete all active traversal rows, then min-merge into endpoint
        self.paths = self.paths.withColumn(
            "status",
            F.when((F.col("status") == "active")
                   & F.col("seed_paths").isNull(), F.lit("deleted"))
            .otherwise(F.col("status")))
        upd = self.paths.join(
            self._maybe_bcast(url_info.select(
                F.col("gkey").alias("head_url"),
                F.col("dist").alias("new_dist"), F.col("new_map")),
                n_url),
            "head_url", "left")
        merged_map = F.map_from_entries(F.sort_array(F.map_entries(
            F.map_zip_with(
                "seed_paths", "new_map",
                lambda k, a, b: F.coalesce(F.least(a, b), a, b)))))
        is_ep = F.col("seed_paths").isNotNull()
        self.paths = upd.select(
            "seed", "head_url", "head_kind", "head_key", "nodes",
            "predicates",
            F.when(is_ep & F.col("new_dist").isNotNull(),
                   F.least("length", "new_dist"))
            .otherwise(F.col("length")).cast("int").alias("length"),
            "status", "created_round", "seq",
            F.when(is_ep & F.col("new_map").isNotNull(), merged_map)
            .otherwise(F.col("seed_paths")).alias("seed_paths"),
        )
        # new endpoint rows for heads with no existing endpoint path —
        # the head set stays distributed: anti-join against the current
        # endpoint heads, deterministic seqs via the same two-phase
        # parallel rank the extension cascade uses (url rows ordered by
        # (dist, head) first, then literal rows by head — identical to
        # the old driver loop's order)
        ep_heads = (
            self.paths.filter(
                F.col("seed_paths").isNotNull()
                & (F.col("head_kind") == "url"))
            .select(F.col("head_url").alias("gkey")).distinct())
        new_url_df = url_info.join(ep_heads, "gkey", "left_anti") \
            .localCheckpoint(eager=False)
        n_new = new_url_df.count()
        new_paths = None
        if n_new:
            new_paths = self._endpoint_path_rows(self._assign_wave_seq(
                new_url_df, ["dist", "gkey"], n_new), "url", self.round)
            self.seq_counter += n_new
        if n_lit:
            lits = self._endpoint_path_rows(self._assign_wave_seq(
                lit_info, ["gkey"], n_lit), "literal", self.round)
            new_paths = lits if new_paths is None \
                else new_paths.unionByName(lits)
            self.seq_counter += n_lit
        if new_paths is not None:
            self.paths = self.paths.unionByName(new_paths)
        self.cfg = dc_replace(self.cfg, path_type="endpoint")
        if self.store:
            self._commit({"phase": "convert_to_endpoint"})
        else:
            self._checkpoint_local()

    def _endpoint_path_rows(self, df: DataFrame, kind: str,
                            rnd: int) -> DataFrame:
        """Project (gkey, dist, new_map, seq) group rows into new
        endpoint path rows — the distributed replacement for the old
        driver-side row loop (no head set ever reaches the driver)."""
        return df.select(
            F.lit("").alias("seed"),
            (F.col("gkey") if kind == "url"
             else F.lit(None).cast("string")).alias("head_url"),
            F.lit(kind).alias("head_kind"),
            F.col("gkey").alias("head_key"),
            F.expr("cast(array() as array<string>)").alias("nodes"),
            F.expr("cast(array() as array<string>)").alias("predicates"),
            F.col("dist").cast("int").alias("length"),
            F.lit("active").alias("status"),
            F.lit(rnd).cast("int").alias("created_round"),
            F.col("seq"),
            F.col("new_map").alias("seed_paths"))

    def _extend_endpoint(self, rnd: int, fetched_done) -> int:
        """Endpoint-path extension (EndpointPath.ts:216-372) as joins +
        map algebra, mirroring the oracle's `_extend_round_endpoint`
        exactly: per wave, candidates from all parents are grouped BY
        HEAD; existing endpoint paths absorb new per-seed distances via
        `map_zip_with` min-merge (processUrlCandidate,
        EndpointPath.ts:521-608); unseen heads create one path each with
        seq assigned by (distance, head) order; literal candidates are
        deduped per wave. Parents producing >=1 candidate are deleted."""
        total = 0
        proc_keys: DataFrame | None = None
        pending_heads: list[DataFrame] = []
        # merge-on-read touched keys: every row this cascade can change
        # is either (a) a parent — its head_url is in the wave-1 done
        # set or a later wave's probe set, (b) a min-merged endpoint
        # row — its head_url is in a wave's upd_df head set, or (c) a
        # row created this round (created_round == rnd). All bounded;
        # head-level supersets are safe (unchanged rows upsert as
        # no-ops)
        if isinstance(fetched_done, DataFrame):
            hd0 = fetched_done.select("head_url")
        else:
            hd0 = self.spark.createDataFrame(
                [(u,) for u in fetched_done], "head_url string")
        self._touch_keys("paths", "head_url", hd0)
        self._touch_pred("paths", F.col("created_round") == F.lit(rnd))
        parents = _semi_filter(
            self.spark,
            self.paths.filter(
                (F.col("status") == "active")
                & (F.col("head_kind") == "url")),
            "head_url", fetched_done)
        ends = self.ends.cache()
        self._wave_caches.append(ends)
        bf, n_bf = None, 0
        if self.cfg.follow_direction:
            t = self.triples.withColumn("okey", _object_key_col())
            # cached: every wave's candidate job joins bf, and without
            # the cache each wave re-aggregates the ENTIRE triple
            # store (O(store) per wave instead of per round)
            bf = t.groupBy("predicate").agg(
                F.countDistinct("subject").alias("bf_subj"),
                F.countDistinct("okey").alias("bf_obj"),
            ).withColumnRenamed("predicate", "pred").cache()
            self._wave_caches.append(bf)
            # one row per distinct predicate in the whole store — gate
            # its broadcast on the counted size (a pathological
            # generated-URI vocabulary would blow the hint); the count
            # also materializes the cache once for all waves
            n_bf = bf.count()
        guard = 0
        # endpoint mode keeps ONE url path per head, so the parents of
        # every wave are bounded by the driver-side head list (the
        # round's fetched heads, then each wave's next_heads) — the
        # broadcast decision needs no extra count job
        n_parents = len(fetched_done)
        while guard < 100:
            guard += 1
            p = parents.filter(F.col("length") < self.cfg.max_path_length)
            cand = self._maybe_bcast(p.select(
                F.col("head_url").alias("p_head"),
                F.col("length").alias("p_length"),
                F.col("seed_paths").alias("p_seeds"),
                F.col("seq").alias("parent_seq"),
            ), n_parents, limit=self.cfg.wave_broadcast_limit) \
                .join(ends, F.col("p_head") == F.col("end"))
            cand = (cand.withColumn("t_dir", F.col("dir_rank"))
                    .withColumn("t_end", F.col("end"))
                    .withColumn("t_raw", F.col("node_raw"))
                    .withColumn("t_kind", F.col("node_kind")))
            cand = cand.filter(F.col("pred") != F.col("p_head"))
            # isExtensionAllowed: FUTURE limitations only, label preds
            # exempt (EndpointPath.ts:160-190); the spl>=maxPathLength
            # gate is the p filter above
            cand = self._endpoint_pred_filter(cand, "pred")
            # blank candidates split off AFTER the predicate-limit gate
            # (oracle order: pred==head rule → pred_allowed → kind
            # branch); the earlier formulation filtered blanks out of
            # cand before taking them, leaving the 2-hop branch dead
            blank_cand = cand.filter(F.col("node_kind") == "blank")
            cand = cand.filter(F.col("node_kind") != "blank")
            lit = cand.filter(F.col("node_kind") == "literal") \
                .withColumn("add", F.lit(1))
            uri = cand.filter(
                (F.col("node_kind") == "uri")
                & F.col("node_c").isNotNull()
                & ~F.array_contains(F.map_keys("p_seeds"),
                                    F.col("node_c")))
            if bf is not None:
                ratio = F.col("bf_subj") / F.col("bf_obj")
                uri = uri.join(self._maybe_bcast(bf, n_bf),
                               "pred", "left").filter(
                    F.col("bf_subj").isNull() | F.col("bf_obj").isNull()
                    | (F.col("bf_obj") == 0) | (F.col("bf_subj") == 0)
                    | ((ratio >= F.lit(self.cfg.bf_neutral_high))
                       & (F.col("dir_rank") == 0))
                    | ((ratio <= F.lit(self.cfg.bf_neutral_low))
                       & (F.col("dir_rank") == 1))
                    | ((ratio > F.lit(self.cfg.bf_neutral_low))
                       & (ratio < F.lit(self.cfg.bf_neutral_high)))
                ).drop("bf_subj", "bf_obj")
            uri = uri.withColumn("add", F.lit(1))
            if self.cfg.allow_blank_nodes:
                # blank 2-hop (EndpointPath.ts:270-337): outgoings of
                # the blank id extend at UNINCREMENTED distance (add=0);
                # parent head is neither end of the outgoing triple, so
                # only neutral-zone/unknown predicates pass direction
                # checkpoint so the parents⋈ends join is not recomputed
                # for the outgoing probe, and so the broadcast decision
                # is made from the REAL blank-candidate count (a wave's
                # candidate set is unbounded at scale)
                blank = blank_cand.select(
                    "p_head", "p_length", "p_seeds", "parent_seq",
                    F.col("node_raw").alias("blank_id")) \
                    .localCheckpoint(eager=False)
                n_blank = blank.count()
                out = self._maybe_bcast(
                    blank, n_blank,
                    limit=self.cfg.wave_broadcast_limit).join(
                    ends.select(
                        F.col("end").alias("o_end"),
                        F.col("dir_rank").alias("o_dir"),
                        F.col("pred").alias("o_pred"),
                        F.col("node_kind").alias("o_kind"),
                        F.col("node_key").alias("o_key"),
                        F.col("node_c").alias("o_c"),
                        F.col("node_raw").alias("o_raw"),
                        F.col("t_dt").alias("o_dt"),
                        F.col("t_lang").alias("o_lang")),
                    (F.col("blank_id") == F.col("o_end"))
                    & (F.col("o_dir") == 0)
                    & (F.col("o_kind") != "blank"))
                out = out.filter(F.col("o_pred") != F.col("p_head"))
                out = self._endpoint_pred_filter(out, "o_pred")
                sel = ["p_head", "p_length", "p_seeds", "parent_seq",
                       F.col("o_pred").alias("pred"),
                       F.col("o_kind").alias("node_kind"),
                       F.col("o_key").alias("node_key"),
                       F.col("o_c").alias("node_c"),
                       F.lit(0).alias("add"),
                       F.lit(0).alias("t_dir"),
                       F.col("o_end").alias("t_end"),
                       F.col("o_raw").alias("t_raw"),
                       F.col("o_kind").alias("t_kind"),
                       F.col("o_dt").alias("t_dt"),
                       F.col("o_lang").alias("t_lang")]
                out_lit = out.filter(F.col("o_kind") == "literal") \
                    .select(*sel)
                out_uri = out.filter(
                    (F.col("o_kind") == "uri")
                    & F.col("o_c").isNotNull()
                    & ~F.array_contains(F.map_keys("p_seeds"),
                                        F.col("o_c"))).select(*sel)
                if bf is not None:
                    ratio = F.col("bf_subj") / F.col("bf_obj")
                    out_uri = out_uri.join(
                        self._maybe_bcast(bf, n_bf), "pred",
                        "left").filter(
                        F.col("bf_subj").isNull()
                        | F.col("bf_obj").isNull()
                        | (F.col("bf_obj") == 0)
                        | (F.col("bf_subj") == 0)
                        | ((ratio > F.lit(self.cfg.bf_neutral_low))
                           & (ratio < F.lit(self.cfg.bf_neutral_high)))
                    ).drop("bf_subj", "bf_obj")
                keep = ["p_head", "p_length", "p_seeds", "parent_seq",
                        "pred", "node_kind", "node_key", "node_c", "add",
                        "t_dir", "t_end", "t_raw", "t_kind",
                        "t_dt", "t_lang"]
                uri = uri.select(keep).unionByName(out_uri.select(keep))
                lit = lit.select(keep).unionByName(out_lit.select(keep))
            # fully distributed from here: the wave's candidate classes
            # are checkpointed once (flat plans for their 3-4 consumers)
            # and per-head grouping / min-merge / seq assignment run as
            # DataFrame aggregations — no candidate row ever reaches
            # the driver (a mega-wave's endpoint grouping scales with
            # executors, not driver memory)
            ccols = ["parent_seq", "pred", "add", "p_length", "p_seeds",
                     "node_c", "node_key", "t_dir", "t_end", "t_raw",
                     "t_kind", "t_dt", "t_lang"]
            uri = uri.select(*ccols).localCheckpoint(eager=True)
            lit = lit.select(*ccols).localCheckpoint(eager=True)
            # processTriples ledger: every triple behind a surviving URI
            # candidate (incl. blank-chain outgoings); literal
            # candidates only for DIRECT rdfs:label/comment (add=1) —
            # blank-chained label literals are not recorded (oracle
            # _endpoint_blank_chain vs _extend_round_endpoint)
            def tkey_proj(df):
                return df.select(
                    F.when(F.col("t_dir") == 0, F.col("t_end"))
                     .otherwise(F.col("t_raw")).alias("subject"),
                    F.col("pred").alias("predicate"),
                    F.when(F.col("t_dir") == 0, F.col("t_kind"))
                     .otherwise(F.lit("uri")).alias("object_kind"),
                    F.when(F.col("t_dir") == 0, F.col("t_raw"))
                     .otherwise(F.col("t_end")).alias("object_value"),
                    F.when(F.col("t_dir") == 0,
                           F.coalesce(F.col("t_dt"), F.lit("")))
                     .otherwise(F.lit("")).alias("object_datatype"),
                    F.when(F.col("t_dir") == 0,
                           F.coalesce(F.col("t_lang"), F.lit("")))
                     .otherwise(F.lit("")).alias("object_language"),
                )

            label_list = sorted(LABEL_PREDICATES)
            lk = tkey_proj(uri).unionByName(tkey_proj(
                lit.filter((F.col("add") == 1)
                           & F.col("pred").isin(label_list))))
            proc_keys = lk if proc_keys is None \
                else proc_keys.unionByName(lk)

            def ginfo(df, key_col):
                # dist = min(p_length + add); seed map = per-seed min
                # (the oracle's grouped() as two aggregations)
                base = df.select(
                    F.col(key_col).alias("gkey"),
                    (F.col("p_length") + F.col("add")).cast("int")
                    .alias("d"),
                    "add", "p_seeds")
                dists = base.groupBy("gkey").agg(F.min("d").alias("dist"))
                seeds = (
                    base.select("gkey", "add", F.explode("p_seeds"))
                    .groupBy("gkey", "key")
                    .agg(F.min(F.col("value") + F.col("add"))
                         .cast("int").alias("mv")))
                maps = seeds.groupBy("gkey").agg(
                    F.map_from_entries(F.sort_array(F.collect_list(
                        F.struct("key", "mv")))).alias("new_map"))
                return dists.join(maps, "gkey", "left").withColumn(
                    "new_map",
                    F.coalesce("new_map",
                               F.expr("cast(map() as map<string,int>)")))

            url_info = ginfo(uri, "node_c").localCheckpoint(eager=False)
            lit_info = ginfo(lit, "node_key").localCheckpoint(eager=False)
            n_url_heads = url_info.count()
            n_lit_heads = lit_info.count()
            if n_url_heads == 0 and n_lit_heads == 0:
                break
            # min-merge into existing endpoint paths (map_zip_with);
            # broadcast under the size gate, shuffle on head_url above
            # it (a mega-wave side would blow the broadcast limit)
            upd_df = url_info.select(
                F.col("gkey").alias("head_url"),
                F.col("dist").alias("new_dist"), "new_map")
            # checkpoint-anchored (url_info) — free to re-probe at
            # commit time
            self._touch_keys("paths", "head_url", upd_df)
            # fat rows (per-seed new_map) — gate on the tighter wave
            # limit like the other map/array-bearing sides, not the
            # generic key limit (many seeds ⇒ wide maps)
            upd = self.paths.join(
                self._maybe_bcast(upd_df, n_url_heads,
                                  limit=self.cfg.wave_broadcast_limit),
                "head_url", "left")
            merged_map = F.map_from_entries(F.sort_array(F.map_entries(
                F.map_zip_with(
                    "seed_paths", "new_map",
                    lambda k, a, b: F.coalesce(F.least(a, b), a, b)))))
            self.paths = upd.select(
                "seed", "head_url", "head_kind", "head_key", "nodes",
                "predicates",
                F.when(F.col("new_dist").isNotNull(),
                       F.least("length", "new_dist"))
                .otherwise(F.col("length")).cast("int").alias("length"),
                "status", "created_round", "seq",
                F.when(F.col("new_map").isNotNull(), merged_map)
                .otherwise(F.col("seed_paths")).alias("seed_paths"),
            )
            # parents producing >=1 candidate are deleted
            ext_df = (uri.select("parent_seq")
                      .unionByName(lit.select("parent_seq"))
                      .distinct()
                      .withColumnRenamed("parent_seq", "seq")
                      .withColumn("was_extended", F.lit(True)))
            self.paths = (
                # n_parents bounds the distinct extended parent seqs
                self.paths.join(self._maybe_bcast(ext_df, n_parents),
                                "seq", "left")
                .withColumn(
                    "status",
                    F.when(F.col("was_extended"), F.lit("deleted"))
                    .otherwise(F.col("status")))
                .drop("was_extended"))
            # new paths for unseen heads: anti-join against the current
            # head set; seq by (dist, head) order for urls, then (head)
            # for literals — deterministic parallel rank either way
            known = (self.paths.filter(F.col("head_kind") == "url")
                     .select(F.col("head_url").alias("gkey")).distinct())
            new_url_df = url_info.join(known, "gkey", "left_anti") \
                .localCheckpoint(eager=True)
            n_new = new_url_df.count()

            new_paths = None
            if n_new:
                new_paths = self._endpoint_path_rows(self._assign_wave_seq(
                    new_url_df, ["dist", "gkey"], n_new), "url", rnd)
                self.seq_counter += n_new
            if n_lit_heads:
                lits = self._endpoint_path_rows(self._assign_wave_seq(
                    lit_info, ["gkey"], n_lit_heads), "literal", rnd)
                new_paths = lits if new_paths is None \
                    else new_paths.unionByName(lits)
                self.seq_counter += n_lit_heads
            if new_paths is not None:
                self.paths = self.paths.unionByName(new_paths)
            total += n_new + n_lit_heads
            self._note_insert("paths", n_new + n_lit_heads)
            # unseen heads register as resources ONCE per cascade (see
            # _extend's wave note: heads reached through the edge view
            # were already discovered in their triple's round, so the
            # per-wave insert is a no-op job tax); next wave = new
            # heads whose resource is already done — a semi-join probe
            # against the resources table (independent of the deferred
            # insert: unvisited-row inserts never change DONE rows).
            # The head set stays a (checkpointed) DataFrame end to end;
            # only its count reaches the driver
            n_next = 0
            probe = None
            if n_new:
                heads_df = new_url_df.select(F.col("gkey").alias("url"))
                pending_heads.append(heads_df)
                probe = heads_df.join(
                    self.resources.filter(
                        F.col("status") == "done").select("url"),
                    "url", "left_semi") \
                    .withColumnRenamed("url", "head_url") \
                    .localCheckpoint(eager=True)
                n_next = probe.count()
            if n_next == 0:
                break
            # next wave's parents (deleted when they extend) live at
            # these heads — checkpointed, so the commit probe is free
            self._touch_keys("paths", "head_url", probe)
            self.paths = self.paths.localCheckpoint(eager=True)
            parents = self.paths.filter(
                (F.col("status") == "active")
                & (F.col("head_kind") == "url")) \
                .join(probe, "head_url", "left_semi")
            n_parents = n_next
        if pending_heads:
            heads = pending_heads[0]
            for extra in pending_heads[1:]:
                heads = heads.unionByName(extra)
            self._insert_new_urls(heads.distinct())
        if proc_keys is not None:
            self._ledger_commit(proc_keys)
        return total

    def _extend(self, rnd: int, fetched_done) -> int:
        """Within-round extension cascade (oracle `_extend_round`).

        Wave 1 parents come from the frontier table; wave k>1 parents
        are exactly the children created in wave k-1 whose heads are
        already fetched (or blank) — so the frontier table is touched
        ONCE at the end (one deleted-marking join + one union of the
        per-wave children), not once per wave."""
        total_children = 0
        parents = _semi_filter(
            self.spark,
            self.paths.filter(
                (F.col("status") == "active")
                & F.col("head_kind").isin("url", "blank")),
            "head_url", fetched_done)
        # every wave probes the full edge view; one cached
        # materialization per round beats re-scanning the union of
        # appended batches wave after wave (dropped at round end)
        ends = self.ends.cache()
        self._wave_caches.append(ends)
        # mega-waves (parents above wave_broadcast_limit) join by
        # SHUFFLE — and a plain cache makes every such wave re-shuffle
        # the store-sized edge view. A cache hash-partitioned on the
        # join key reports its partitioning through InMemoryRelation,
        # so EnsureRequirements adds NO exchange on the ends side:
        # one repartition per round (lazy — broadcast-only rounds
        # never pay it) replaces one store-sized exchange PER WAVE
        ends_hashed: list[DataFrame] = []

        def _ends_for(n_parents: int) -> DataFrame:
            if n_parents <= self.cfg.wave_broadcast_limit:
                return ends  # broadcast wave: ends never shuffles
            if not ends_hashed:
                n_part = int(self.spark.conf.get(
                    "spark.sql.shuffle.partitions"))
                eh = ends.repartition(n_part, "end").cache()
                # materialize NOW: until the cache's adaptive plan is
                # final, InMemoryRelation reports unknown partitioning
                # and every consumer join re-adds the ends exchange
                # (measured: ENSURE_REQUIREMENTS 2 → 1 per wave)
                eh.count()
                self._wave_caches.append(eh)
                ends_hashed.append(eh)
            return ends_hashed[0]
        bf, n_bf = None, 0
        if self.cfg.follow_direction:
            t = self.triples.withColumn("okey", _object_key_col())
            # cached: every wave's candidate job joins bf, and without
            # the cache each wave re-aggregates the ENTIRE triple
            # store (O(store) per wave instead of per round)
            bf = t.groupBy("predicate").agg(
                F.countDistinct("subject").alias("bf_subj"),
                F.countDistinct("okey").alias("bf_obj"),
            ).withColumnRenamed("predicate", "pred").cache()
            self._wave_caches.append(bf)
            # distinct-predicate-sized: gate the hint + warm the cache
            n_bf = bf.count()
        all_children: list[DataFrame] = []
        ext_seq_dfs: list[DataFrame] = []
        pending_heads: list[DataFrame] = []
        proc_keys: DataFrame | None = None
        label_list = sorted(LABEL_PREDICATES)
        done_res = self.resources.filter(
            F.col("status") == "done").select(
            F.col("url").alias("head_url"))
        # the per-wave done probe intersects the wave's head set with
        # the store-sized done-resource set. Left-semi can only
        # broadcast its RIGHT side, so the old `url_heads ⋈ done_res`
        # orientation either broadcast the STORE or shuffled both
        # sides every wave. Flipped (`done_res ⋉ url_heads` — the same
        # intersection of two distinct url sets): below the wave gate
        # the bounded head set broadcasts and the store side never
        # shuffles; above it, done_res is hash-partitioned + cached
        # ONCE per round (mirror of _ends_for) so mega-waves reuse the
        # partitioning instead of re-exchanging the store per wave
        done_hashed: list[DataFrame] = []

        def _done_probe(url_heads: DataFrame, n_bound: int) -> DataFrame:
            if n_bound <= self.cfg.wave_broadcast_limit:
                return done_res.join(F.broadcast(url_heads),
                                     "head_url", "left_semi")
            if not done_hashed:
                n_part = int(self.spark.conf.get(
                    "spark.sql.shuffle.partitions"))
                dh = done_res.repartition(n_part, "head_url").cache()
                # materialize: an unfinalized AQE cache plan reports
                # unknown partitioning (see _ends_for)
                dh.count()
                self._wave_caches.append(dh)
                done_hashed.append(dh)
            return done_hashed[0].join(url_heads, "head_url", "left_semi")
        guard = 0
        self._last_extend_profile = []
        import time as _time
        # wave-1 parents come from the frontier table, whose matched
        # size is unknown until counted — cache + count once so the
        # broadcast decision is made from the real size (and the wave
        # join reads the cached rows instead of re-scanning paths).
        # Wave k>1 parents are a subset of wave k-1's children, so the
        # previous wave's child count bounds them for free.
        parents = parents.cache()
        self._wave_caches.append(parents)
        n_parents = parents.count()
        while guard < 100:
            guard += 1
            _w0 = _time.time()
            cand = self._extend_wave(rnd, parents, _ends_for(n_parents),
                                     bf, n_parents, n_bf)
            cand.cache()
            self._wave_caches.append(cand)
            # the count both materializes the cache and picks the seq
            # strategy from the EXACT wave size (a heads×branching hint
            # underestimates hub pages and would funnel a huge wave
            # through the single-partition window)
            n = cand.count()
            _wp = {"n": n, "cand_s": round(_time.time() - _w0, 2)}
            self._last_extend_profile.append(_wp)
            if n == 0:
                break
            # LAZY checkpoint (not cache, not eager): the children feed
            # FOUR consumers (ledger keys, extended-seq marking, the
            # frontier union, next-wave parents) — with a cache, each
            # consumer's LOGICAL plan still embeds the whole cascade
            # chain and the round-end paths plan grows quadratically in
            # waves (large crawls OOM the planner's tree-string alone);
            # the checkpoint truncates every downstream plan to one
            # node either way (the RDD is created at once, computed on
            # first use). Lazy because the next wave's candidate count
            # ALWAYS runs (the cascade only stops on a zero count), so
            # the materialization folds into that job instead of paying
            # a dedicated ~0.25 s job per wave; children derive only
            # from the cached cand frame, so deferred computation reads
            # identical data
            _w1 = _time.time()
            children = self._finish_children(rnd, cand, n) \
                .localCheckpoint(eager=False)
            _wp["ckpt_s"] = round(_time.time() - _w1, 2)
            # processTriples ledger (insertProcTriples,
            # process-paths.ts:874-887): every triple that extended a
            # path; literal children only for rdfs:label/comment
            # (Manager.ts:418-448 / oracle _extend_parent). Accumulated
            # as a distributed key projection, resolved at cascade end.
            lk = children.filter(
                (F.col("head_kind") != "literal")
                | F.col("t_pred").isin(label_list)
            ).select(
                F.when(F.col("t_dir") == 0, F.col("t_end"))
                 .otherwise(F.col("t_raw")).alias("subject"),
                F.col("t_pred").alias("predicate"),
                F.when(F.col("t_dir") == 0, F.col("t_kind"))
                 .otherwise(F.lit("uri")).alias("object_kind"),
                F.when(F.col("t_dir") == 0, F.col("t_raw"))
                 .otherwise(F.col("t_end")).alias("object_value"),
                F.when(F.col("t_dir") == 0,
                       F.coalesce(F.col("t_dt"), F.lit("")))
                 .otherwise(F.lit("")).alias("object_datatype"),
                F.when(F.col("t_dir") == 0,
                       F.coalesce(F.col("t_lang"), F.lit("")))
                 .otherwise(F.lit("")).alias("object_language"),
            )
            proc_keys = lk if proc_keys is None \
                else proc_keys.unionByName(lk)
            total_children += n
            self.seq_counter += n
            all_children.append(children)
            ext_seq_dfs.append(children.select("parent_seq"))
            # unseen child heads must register as resources (oracle
            # `_add_resource` during extension) — but a head reached
            # through the edge view was ALREADY discovered in the round
            # that produced its triple (_discover_urls inserts every
            # named node of every round's quads), so the per-wave
            # insert is a no-op in all but pathological cases. Batch
            # the wave head sets and insert ONCE per cascade instead of
            # paying three no-op jobs per wave (profiled ~0.8 s/wave ×
            # ~35 waves on the 24k-page bench). The next-wave done
            # probe below is independent of the insert (it joins the
            # head set against the DONE rows, which an unvisited-row
            # insert can never change).
            url_heads = children.filter(
                F.col("head_kind") == "url").select(F.col("head_url"))
            pending_heads.append(url_heads)
            # next wave: blank heads chain immediately; url heads whose
            # resource is already done re-extend against the store.
            # The probe stays LAZY: it folds into the next wave's
            # candidate job (children are checkpointed, so the plan
            # stays one node deep) and the cascade terminates on that
            # job's child count instead of a dedicated probe job —
            # one fewer job per wave, and no distincts anywhere on the
            # probe path (semi-join right sides ignore duplicates;
            # the cascade-end head insert re-distincts before its
            # anti-join). Safe to defer because the done-resource set
            # cannot change mid-cascade — head inserts are batched to
            # cascade end and only ever add `unvisited` rows. The
            # per-wave head set still never reaches the driver, and a
            # mega-wave's re-extension semi-join scales with executors
            probe = (
                _done_probe(url_heads, n)
                .unionByName(
                    children.filter(F.col("head_kind") == "blank")
                    .select("head_url"))
            )
            parents = children.join(probe, "head_url", "left_semi")
            n_parents = n  # children of this wave bound the next parents
        if pending_heads:
            # the cascade's one head registration (see the wave note)
            heads = pending_heads[0]
            for extra in pending_heads[1:]:
                heads = heads.unionByName(extra)
            self._insert_new_urls(
                heads.distinct().withColumnRenamed("head_url", "url"))
        if total_children:
            ext_df = ext_seq_dfs[0]
            for extra in ext_seq_dfs[1:]:
                ext_df = ext_df.unionByName(extra)
            ext_df = ext_df.distinct().withColumnRenamed(
                "parent_seq", "seq").withColumn(
                "was_extended", F.lit(True))

            def mark_deleted(df):
                # total_children bounds the distinct extended seqs
                return (
                    df.join(self._maybe_bcast(ext_df, total_children),
                            "seq", "left")
                    .withColumn(
                        "status",
                        F.when(F.col("was_extended"), F.lit("deleted"))
                        .otherwise(F.col("status")))
                    .drop("was_extended"))

            cols = ["seed", "head_url", "head_kind", "head_key", "nodes",
                    "predicates", "length", "status", "created_round", "seq",
                    "seed_paths"]
            new_paths = all_children[0].select(cols)
            for extra in all_children[1:]:
                new_paths = new_paths.unionByName(extra.select(cols))
            # children extended in a later wave of this cascade are
            # already deleted, so the marking applies to them too
            self.paths = mark_deleted(self.paths).unionByName(
                mark_deleted(new_paths))
            # merge-on-read touched keys: deleted parents by seq
            # (ext_df is anchored on the per-wave children
            # checkpoints), inserted children by created_round
            self._touch_keys("paths", "seq", ext_df)
            self._touch_pred(
                "paths", F.col("created_round") == F.lit(rnd))
            self._note_insert("paths", total_children)
            self._ledger_commit(proc_keys)
        return total_children

    #: wave-size ceiling for the single-window seq path; above it the
    #: two-phase range rank runs instead (overridable per engine, e.g.
    #: set to 0 in tests to force the scale path)
    seq_rank_threshold: int = 50_000

    #: last round's schedule gate DataFrame (plan-spy surface for the
    #: mega-domain WindowGroupLimit check; not used by the engine)
    _last_schedule_df = None

    def _assign_wave_seq(self, cand: DataFrame, key_cols: list[str],
                         n: int) -> DataFrame:
        """Dense deterministic seq = seq_counter + rank under the wave
        order. A bare ``Window.orderBy`` funnels every wave child
        through ONE task — fine for bounded waves, a non-starter when a
        10^10-scale round produces tens of millions of children. Above
        ``seq_rank_threshold`` (``n`` is the wave's EXACT child count,
        known because the caller counts the cached candidate set) the
        rank is computed in two phases instead: range-repartition
        by the sort key, count per partition (one lightweight job),
        then per-partition ``row_number`` + broadcast prefix offsets —
        identical output, fully parallel."""
        if n <= self.seq_rank_threshold:
            sw = Window.orderBy(*key_cols)
            return cand.withColumn(
                "seq",
                (F.row_number().over(sw) - F.lit(1)
                 + F.lit(self.seq_counter)).cast("long"))
        n_parts = max(2, self.spark.sparkContext.defaultParallelism)
        rp = (cand.repartitionByRange(n_parts, *key_cols)
              .withColumn("_pid", F.spark_partition_id()))
        rp = rp.cache()
        self._wave_caches.append(rp)
        counts = {r["_pid"]: r["count"]
                  for r in rp.groupBy("_pid").count().collect()}
        offs, acc = [], 0
        for pid in sorted(counts):
            offs.append((pid, acc))
            acc += counts[pid]
        off_df = self.spark.createDataFrame(offs, "_pid int, _off long")
        pw = Window.partitionBy("_pid").orderBy(*key_cols)
        return (
            rp.join(F.broadcast(off_df), "_pid")
            .withColumn(
                "seq",
                (F.row_number().over(pw) - F.lit(1) + F.col("_off")
                 + F.lit(self.seq_counter)).cast("long"))
            .drop("_pid", "_off"))

    def _extend_wave(self, rnd: int, parents: DataFrame, ends: DataFrame,
                     bf: DataFrame | None, n_parents: int,
                     n_bf: int = 0) -> DataFrame:
        # ends is the store-sized side — broadcast parents (so ends
        # never shuffles) only while the known parent bound fits the
        # gate; a mega-wave (measured: 1M+ children/wave at the 600k-
        # page fixture) must shuffle instead of blowing the 8 GB
        # broadcast hard limit
        cand = self._maybe_bcast(parents.select(
            F.col("seed"), F.col("head_url").alias("p_head"),
            F.col("nodes"), F.col("predicates"),
            F.col("length").alias("p_length"),
            F.col("created_round").alias("p_created"),
            F.col("seq").alias("parent_seq"),
        ), n_parents, limit=self.cfg.wave_broadcast_limit) \
            .join(ends, F.col("p_head") == F.col("end"))
        # cycle rule: predicate == head.url (TraversalPath.ts:408-449)
        cand = cand.filter(F.col("pred") != F.col("p_head"))
        # dedup one child per (parent, predicate, node_key), prefer
        # head-as-subject (dir_rank 0) — BEFORE the direction filter to
        # match the oracle's keep-first-then-filter order. min_by is a
        # hash aggregation with map-side partials (a sort window would
        # re-sort every wave); deterministic because dir_rank is unique
        # within a group (same (pred,node_key,dir) ⇒ same triple).
        # p_head leads the grouping keys: parent_seq determines p_head,
        # so the groups are unchanged — but p_head is the JOIN key, so
        # on the shuffle-join path the join's output partitioning
        # already satisfies the agg's clustering and the fat child rows
        # (nodes/predicates arrays) skip a whole extra shuffle
        # (measured: 3 → 2 exchanges in the executed plan)
        keys = ["p_head", "parent_seq", "pred", "node_key"]
        rest = [c for c in cand.columns if c not in keys]
        cand = (
            cand.groupBy(*keys)
            .agg(F.min_by(F.struct(*rest), F.col("dir_rank")).alias("_r"))
            .select(*keys, "_r.*")
        )
        cand = self._pred_limit_filter(cand)
        if bf is not None:
            ratio = F.col("bf_subj") / F.col("bf_obj")
            cand = cand.join(self._maybe_bcast(bf, n_bf),
                             "pred", "left").filter(
                F.col("bf_subj").isNull() | F.col("bf_obj").isNull()
                | (F.col("bf_obj") == 0) | (F.col("bf_subj") == 0)
                | ((ratio >= F.lit(self.cfg.bf_neutral_high))
                   & (F.col("dir_rank") == 0))
                | ((ratio <= F.lit(self.cfg.bf_neutral_low))
                   & (F.col("dir_rank") == 1))
                | ((ratio > F.lit(self.cfg.bf_neutral_low))
                   & (ratio < F.lit(self.cfg.bf_neutral_high)))
            ).drop("bf_subj", "bf_obj")
        # new predicates (distinct, order-preserving) + bound
        cand = cand.withColumn(
            "new_predicates",
            F.when(F.array_contains("predicates", F.col("pred")),
                   F.col("predicates"))
            .otherwise(F.concat("predicates", F.array(F.col("pred")))),
        ).filter(F.size("new_predicates") <= self.cfg.max_path_props)
        # resolve node per kind (node_c pre-canonicalized in _ends_of)
        allow_blank = self.cfg.allow_blank_nodes
        uri_ok = (F.col("node_kind") == "uri") & F.col("node_c").isNotNull() \
            & ~F.array_contains("nodes", F.col("node_c")) \
            & (F.col("p_length") + 1 <= self.cfg.max_path_length)
        blank_ok = (F.col("node_kind") == "blank") & F.lit(allow_blank) \
            & ~F.array_contains("nodes", F.col("node_c"))
        lit_ok = F.col("node_kind") == "literal"
        return cand.filter(uri_ok | blank_ok | lit_ok)

    def _finish_children(self, rnd: int, cand: DataFrame,
                         n: int) -> DataFrame:
        """Assign the deterministic wave seq (the oracle's wave order =
        parent priority, predicate, node_key) and project the final
        child-path rows."""
        lit_ok = F.col("node_kind") == "literal"
        cand = self._assign_wave_seq(
            cand, ["p_length", "p_created", "parent_seq", "pred",
                   "node_key"], n)
        return cand.select(
            "parent_seq",
            F.col("seed"),
            F.when(lit_ok, F.lit(None).cast("string"))
             .otherwise(F.col("node_c")).alias("head_url"),
            F.when(lit_ok, F.lit("literal"))
             .when(F.col("node_kind") == "blank", F.lit("blank"))
             .otherwise(F.lit("url")).alias("head_kind"),
            F.col("node_key").alias("head_key"),
            F.when(lit_ok, F.col("nodes"))
             .otherwise(F.concat("nodes", F.array(F.col("node_c"))))
             .alias("nodes"),
            F.col("new_predicates").alias("predicates"),
            F.when(lit_ok | (F.col("node_kind") == "blank"),
                   F.col("p_length"))
             .otherwise(F.col("p_length") + 1).cast("int").alias("length"),
            F.lit("active").alias("status"),
            F.lit(rnd).cast("int").alias("created_round"),
            "seq",
            F.lit(None).cast("map<string,int>").alias("seed_paths"),
            # triple-identity pass-through for the processTriples ledger
            # (ProcessTriple.ts:38-51) — consumed at the wave collect,
            # excluded from the frontier-table union
            F.col("pred").alias("t_pred"),
            F.col("dir_rank").alias("t_dir"),
            F.col("end").alias("t_end"),
            F.col("node_raw").alias("t_raw"),
            F.col("node_kind").alias("t_kind"),
            "t_dt", "t_lang",
        )

    # ------------------------------------------------------------------
    # the round loop
    # ------------------------------------------------------------------
    def run(self, seeds: DataFrame | None = None,
            max_rounds: int | None = None) -> DataFrame:
        """Run the crawl to frontier exhaustion (or ``max_rounds``);
        returns the trace DataFrame."""
        if seeds is not None:
            self.bootstrap(seeds)
        assert self.paths is not None, "bootstrap or resume first"
        cap = max_rounds if max_rounds is not None else self.cfg.max_rounds
        if self.cfg.use_bloom and self._bloom is None:
            # executor-side construction — the driver never
            # materializes the URL set for the filter, only the
            # fixed-size word array
            self._bloom = BloomFilter.build(
                self.spark, self.resources, "url",
                capacity=self.cfg.bloom_capacity, fpp=self.cfg.bloom_fpp)
            # the full build covers any batches queued before it
            self._pending_bloom = []
        if self.cfg.use_bloom and self._triple_bloom is None:
            # store-side filters (fresh-start: both build from an empty
            # store; resume: one store scan rebuilds each, same as the
            # URL filter rebuilding from the restored resources table)
            self._triple_bloom = BloomFilter.build(
                self.spark, self.triples, *TRIPLE_KEY,
                capacity=self.cfg.triple_bloom_capacity,
                fpp=self.cfg.bloom_fpp)
            self._source_bloom = BloomFilter.build(
                self.spark,
                self.triples.select(F.explode("sources").alias("url")),
                "url", capacity=self.cfg.bloom_capacity,
                fpp=self.cfg.bloom_fpp)
            self._pending_store_bloom = []
        import time as _time
        while self.round < cap:
            _t = {}
            _t0 = _time.time()
            rnd = self.round + 1
            eligible = self._eligible_paths()
            eligible.cache()
            n_robots = self._phase_robots(rnd, eligible)
            sched_rows = self._phase_schedule(rnd, eligible)
            _t["sched_s"] = round(_time.time() - _t0, 2)
            n_sched = len(sched_rows)
            if n_robots == 0 and n_sched == 0:
                break
            self.round = rnd
            n_done = 0
            if n_sched:
                _t1 = _time.time()
                trace, quads = self._phase_fetch(rnd, sched_rows)
                _t["fetch_s"] = round(_time.time() - _t1, 2)
                # append-only trace table: the round's rows (schedule-
                # bounded) join the distributed trace; the accumulated
                # trace never lives on the driver
                trace_rows = self.spark.createDataFrame(
                    trace, schemas.TRACE)
                self._trace_df = self._trace_df.unionByName(trace_rows)
                self._append_deltas["trace"].append(trace_rows)
                # The round's status/clock/warning merges are all pure
                # projections of the trace rows — derived as DataFrame
                # algebra over trace_rows (one schedule-bounded frame),
                # NOT driver loops: the only O(schedule) Python left in
                # the round is the bounded trace emit itself (the
                # round-synchronous driver contract).
                #
                # politeness charge: attempted fetches bump next_allowed
                # (oracle: next_allowed = rnd + crawl_delay per access)
                chg_df = (trace_rows
                          .filter(F.col("status") != "error:disallowed")
                          .select("origin").distinct()
                          .withColumn("charged", F.lit(True)))
                self._touch_keys("domains", "origin", chg_df)
                self.domains = (
                    self.domains
                    .join(F.broadcast(chg_df), "origin", "left")
                    .withColumn(
                        "next_allowed",
                        F.when(F.col("charged"),
                               F.lit(rnd) + F.col("crawl_delay"))
                        .otherwise(F.col("next_allowed")).cast("int"))
                    .drop("charged"))
                # resource status updates + crawlId stamps
                # (Resource.ts:35-41 / Worker.ts:395-413: every
                # scheduled resource consumes a per-domain counter
                # BEFORE the robots gate — row_number per origin in
                # rseq order, minus one; domainTs ≡ the round)
                cw = Window.partitionBy("origin").orderBy("seq")
                res_up = trace_rows.select(
                    "url", "origin", "seq",
                    F.when(F.col("status") == "done", F.lit("done"))
                    .otherwise(F.lit("error")).alias("new_status"),
                ).select(
                    "url", "new_status",
                    F.lit(rnd).cast("int").alias("new_cr"),
                    (F.row_number().over(cw) - 1).cast("int")
                    .alias("new_cc"))
                self._touch_keys("resources", "url", res_up)
                self.resources = (
                    self.resources.join(F.broadcast(res_up), "url", "left")
                    .withColumn("status",
                                F.coalesce("new_status", "status"))
                    .withColumn("crawl_round",
                                F.coalesce("new_cr", "crawl_round"))
                    .withColumn("crawl_counter",
                                F.coalesce("new_cc", "crawl_counter"))
                    .drop("new_status", "new_cr", "new_cc")
                )
                # per-domain warning increments (Resource.ts:232-266):
                # any unmapped error status warns E_UNKNOWN — the
                # oracle's fallback (Resource.ts:259-266 else branch),
                # so adding a new error status can never silently
                # desync the counters. lw_new keeps event (rseq) order
                # via sort_array over (seq, errType) structs; w_inc
                # counts per type with first-occurrence keys irrelevant
                # (map compare is key-based).
                et_map = F.create_map(*[
                    F.lit(x) for kv in sorted(WARN_BY_STATUS.items())
                    for x in kv])
                lw = F.transform(
                    F.sort_array(F.collect_list(F.struct("seq", "et"))),
                    lambda s: s["et"])
                wdf = (trace_rows.filter(F.col("status") != "done")
                       .select("origin", "seq",
                               F.coalesce(et_map[F.col("status")],
                                          F.lit("E_UNKNOWN")).alias("et"))
                       .groupBy("origin").agg(lw.alias("lw_new"))
                       .withColumn(
                           "w_inc",
                           F.map_from_entries(F.transform(
                               F.array_distinct("lw_new"),
                               lambda e: F.struct(
                                   e, F.size(F.filter(
                                       "lw_new",
                                       lambda x: x == e)))))))
                self._merge_domain_warnings_df(
                    wdf.select("origin", "w_inc", "lw_new"), n_sched)
                _t1 = _time.time()
                self._last_ingest_profile = {}
                if quads is not None:
                    quads.cache()
                    self._merge_triples(quads)
                    self._discover_urls(quads)
                _t["ingest_s"] = round(_time.time() - _t1, 2)
                if self._last_ingest_profile:
                    _t["ingest_detail"] = dict(self._last_ingest_profile)
                fetched_done = [t[2] for t in trace if t[4] == "done"]
                n_done = len(fetched_done)
                _t1 = _time.time()
                self._last_extend_profile = []
                if fetched_done:
                    if self.cfg.path_type == "endpoint":
                        self._extend_endpoint(rnd, fetched_done)
                    else:
                        self._extend(rnd, fetched_done)
                _t["extend_s"] = round(_time.time() - _t1, 2)
                if self._last_extend_profile:
                    _t["waves"] = list(self._last_extend_profile)
                if quads is not None:
                    quads.unpersist()
                if self._found_cache is not None:
                    self._found_cache.unpersist()
                    self._found_cache = None
            eligible.unpersist()
            metrics = {
                "round": rnd, "scheduled": n_sched,
                "robots_checked": n_robots, "fetched_done": n_done,
                **_t,
            }
            _t1 = _time.time()
            if self.store:
                # per-wave wall-clock profiles stay OUT of the committed
                # manifest (stable schema for downstream bench/compare
                # tooling; they remain on self.metrics for profiling)
                self._commit(
                    {k: v for k, v in metrics.items()
                     if k not in ("waves", "ingest_detail")})
            else:
                self._checkpoint_local()
            metrics["snapshot_s"] = round(_time.time() - _t1, 2)
            self.metrics.append(metrics)
        return self.trace
