#!/usr/bin/env python
"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` plus a crawl-engine throughput run, and
print ONE JSON line::

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "crawl": {"urls": n, "sec": t, "urls_per_sec": r, "rounds": k}}

Scaling mode (north-rule evidence): ``python bench.py --scaling`` runs
the identical mega-round fetch+extract job (operators/batch_fetch.py —
the 10^10-scale regime where per-round fixed costs amortize away) in
two subprocesses at local[N] and local[4N] over the same on-disk
parquet fixture, and reports both throughputs + scaling efficiency
(= speedup / 4). N defaults to 2 (override SPARK_GRAFT_SCALE_N);
see BENCH/BASELINE.md for why N=2→8 rather than 8→32 on this VM
(hyperthreading ceiling, measured with a raw multiprocessing probe).

A/B mode (round-over-round protocol): ``python bench.py --ab
<ref-commit> [--ab-pairs 3]`` checks the ref commit out into a git
worktree and runs the DEFAULT bench alternately (ref/cur, cur/ref, …)
so VM drift cancels, then prints one JSON line with the per-pair suite
/ crawl / per-query ratios and their medians — the machine-generated
replacement for the hand-run pairs of BENCH/BASELINE.md §10
(VERDICT r3 #7). Ratios: suite <1 and crawl >1 ⇒ current is faster.

Subprocess modes: ``--batch-only --cores N --fixture-dir D`` and
``--crawl-only --cores N`` each print one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "frontier_priority",
    "per_domain_topk",
    "seen_set_antijoin",
    "path_extension_join",
    "domains_rollup",
    "branching_factor",
    "alternate_redirects",
    "dedup_exact",
    "minhash_lsh_buckets",
    "minhash64_signatures",
    "jaccard_lsh_pairs",
    "simhash",
    "ann_bruteforce_cosine",
    "ann_ivf",
    "embedding_near_dup",
    "quality_score",
    "doc_fingerprint",
]

# crawl bench workload: deterministic fixture, budgeted for few fat
# rounds (the scale-correct regime: per-round volume amortizes round
# overhead, politeness still binds per domain)
CRAWL_FIXTURE = dict(n_pages=24000, n_origins=300, n_seeds=300, seed=42,
                     out_links=8)
CRAWL_CONFIG = dict(max_path_length=5, max_path_props=3,
                    resources_per_domain=96, max_rounds=10,
                    bloom_capacity=1_000_000)

# scaling workload: one mega-round over heavy Common-Crawl-ish pages,
# cached as parquet on disk so both parallelism levels read the same
# input bytes
SCALE_FIXTURE = dict(n_pages=600_000, n_origins=2000, n_seeds=100,
                     seed=42, out_links=30, min_links=20,
                     text_words=(260, 340), ghost_rate=0.01)
SCALE_CACHE = os.environ.get(
    "SPARK_GRAFT_CACHE", "/tmp/derzis_bench_scale_fixture")


def build(cores: int, shuffle_partitions: int, split_mb: int | None = None):
    from derzis_spark.engine import build_session
    adaptive = os.environ.get("SPARK_GRAFT_AQE", "1") == "1"
    spark = build_session(app="derzis-bench", cores=cores,
                          shuffle_partitions=shuffle_partitions,
                          adaptive=adaptive)
    if split_mb:
        # the scaling fixture is one few-hundred-MB parquet file; a
        # small split size stands in for the many-file layout a real
        # 100 TB pages table has (default 128 MB would scan it in ~1
        # task and serialize the whole job)
        spark.conf.set("spark.sql.files.maxPartitionBytes",
                       str(split_mb * 1024 * 1024))
        # AQE coalescing targets shuffle *bytes* and cannot see that the
        # downstream parse UDF multiplies rows 30x — it would squeeze
        # the post-join stage onto ~2 tasks and serialize the extract
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "false")
        # default 10k-row Arrow batches carry ~50 MB of html each; at
        # high core counts the resulting allocation bursts stall the
        # JVM — smaller batches keep the python workers streaming
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_crawl(spark, repeat: int | None = None,
              with_store: bool = False) -> dict:
    """Crawl-loop throughput, min-of-N (the VM is ±20% noisy; a single
    run can't distinguish a regression from noise round-over-round).

    ``with_store=True`` attaches a snapshot store so every round pays
    the durable Iceberg-style commit (delta chains for the append-only
    tables) — the north rule's "checkpoint every round" regime; kept a
    separate measurement so the headline ``crawl`` number stays
    comparable across rounds that predate the store-on run."""
    import shutil
    import tempfile

    from derzis_spark import schemas
    from derzis_spark.config import CrawlConfig
    from derzis_spark.engine import CrawlEngine
    from derzis_spark.fixtures import generate_fixture

    if repeat is None:
        repeat = int(os.environ.get("SPARK_GRAFT_CRAWL_REPEAT", "3"))
    fx = generate_fixture(**CRAWL_FIXTURE)
    pages = spark.createDataFrame(fx.pages_rows(), schemas.PAGES)
    pages.cache()
    pages.count()
    robots = spark.createDataFrame(fx.robots_rows(), schemas.ROBOTS)
    seeds = spark.createDataFrame([(u,) for u in fx.seeds], schemas.SEEDS)
    cfg = CrawlConfig(**CRAWL_CONFIG)
    runs: list[float] = []
    best: dict | None = None
    for _ in range(max(1, repeat)):
        wd = tempfile.mkdtemp(prefix="derzis_bench_snap_") \
            if with_store else None
        try:
            engine = CrawlEngine(spark, pages, robots, cfg, work_dir=wd)
            t0 = time.time()
            engine.run(seeds)
            dt = time.time() - t0
        finally:
            if wd:
                shutil.rmtree(wd, ignore_errors=True)
        # every scheduled URL gets exactly one trace row, so the
        # metrics already carry the count — no trace collect needed
        n_urls = sum(m.get("scheduled", 0) for m in engine.metrics)
        runs.append(round(dt, 2))
        if best is None or dt < best["sec"]:
            best = {
                "urls": n_urls,
                "sec": round(dt, 2),
                "urls_per_sec": round(n_urls / dt, 2) if dt > 0 else 0.0,
                "rounds": engine.round,
            }
            if with_store:
                best["snapshot_s_total"] = round(sum(
                    m.get("snapshot_s", 0.0) for m in engine.metrics), 2)
    return {**best, "runs": runs}


def ensure_scale_fixture() -> str:
    """Generate + write the scaling fixture parquet once; reuse after."""
    marker = os.path.join(SCALE_CACHE, ".complete")
    if os.path.exists(marker):
        return SCALE_CACHE
    from derzis_spark.fixtures import generate_fixture, write_fixture_parquet

    t0 = time.time()
    fx = generate_fixture(**SCALE_FIXTURE)
    write_fixture_parquet(fx, SCALE_CACHE)
    with open(marker, "w") as f:
        f.write(json.dumps({"gen_sec": round(time.time() - t0, 1),
                            **{k: str(v) for k, v in SCALE_FIXTURE.items()}}))
    return SCALE_CACHE


def run_batch(spark, fixture_dir: str, repeat: int = 3) -> dict:
    from pyspark.sql import functions as F
    from derzis_spark.functions import udfs
    from derzis_spark.operators.batch_fetch import fetch_extract_batch

    pages = spark.read.parquet(os.path.join(fixture_dir, "pages.parquet"))
    robots = spark.read.parquet(os.path.join(fixture_dir, "robots.parquet"))
    best = None
    stats = None
    for _ in range(max(1, repeat)):  # min-of-N: the VM is noisy
        t0 = time.time()
        # frontier=None → full-corpus mega-round (schedule == pages)
        stats = fetch_extract_batch(spark, None, pages, robots,
                                    fused=True)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return {
        **stats,
        "sec": round(best, 2),
        "urls_per_sec": round(stats["fetched"] / best, 1) if best else 0.0,
    }


def run_queries(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entry_mod

    # warm the JVM + parquet reader once so the first timed query does
    # not absorb session startup (codegen, datasource init); warm on
    # whichever table exists in the fixture dir
    for t in ("region", "documents", "events"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).count()
            break
    spark.range(1000).selectExpr("sum(id)").collect()

    qs = dict(entry_mod.queries())
    # the driver's 50-entry cap merged these into tagged-union entries
    # (jaccard_near_dup, ann_topk, doc_fingerprint); the headline suite
    # keeps timing the raw variants so per-query numbers stay
    # comparable across rounds
    from derzis_spark import pipeline_queries as P
    qs.update({
        "jaccard_lsh_pairs": P.q_jaccard_lsh_pairs,
        "ann_bruteforce_cosine": P.q_ann_bruteforce_cosine,
        "ann_ivf": P.q_ann_ivf,
        "doc_fingerprint": P.q_doc_fingerprint,
        "quality_score": P.q_quality_score,
    })
    out = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)

    return out


def run_fast_variants(spark, sf_dir: str) -> dict:
    """Production-variant timings kept OUT of the headline total so
    round-over-round totals stay comparable: the xxhash64 token-hash
    fast paths (no DuckDB equivalent, so benched here instead of
    queries()) and the Lloyd-refined IVF (oracle-checked inside the
    ann_topk union; timed here as the recall-quality variant of the
    headline ann_ivf — BENCH/ann_recall_r4.json)."""
    from derzis_spark.pipeline_queries import (
        q_ann_ivf_lloyd, q_minhash64_signatures_fast,
        q_simhash64_near_dup_fast)

    out = {}
    for name, fn in (
            ("minhash64_signatures_fast", q_minhash64_signatures_fast),
            ("simhash64_near_dup_fast", q_simhash64_near_dup_fast),
            ("ann_ivf_lloyd2", q_ann_ivf_lloyd)):
        t0 = time.time()
        fn(spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
    return out


def run_new_ops(spark, sf_dir: str) -> dict:
    """Round-4/5 additions, timed in their own section and kept OUT of
    the headline total so round-over-round suite totals stay
    comparable."""
    from derzis_spark import pipeline_queries as P

    out = {}
    for name, fn in (("simhash_near_dup", P.q_simhash_near_dup),
                     ("dedup_clusters", P.q_dedup_clusters),
                     ("winnow_fingerprint", P.q_winnow_fingerprint),
                     ("jaccard_shingle_pairs", P.q_jaccard_shingle_pairs),
                     ("text_stats", P.q_text_stats),
                     ("decontaminate", P.q_decontaminate),
                     ("segment_dedup", P.q_segment_dedup),
                     ("tfidf_top_terms", P.q_tfidf_top_terms),
                     ("train_split", P.q_train_split),
                     # round 5
                     ("pii_scrub", P.q_pii_scrub),
                     ("corpus_mix", P.q_corpus_mix),
                     ("cdc_segment_dedup", P.q_cdc_segment_dedup),
                     ("lang_id_trigram", P.q_lang_id)):
        t0 = time.time()
        fn(spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
    return out


def run_ab(ref_commit: str, pairs: int) -> None:
    """Interleaved A/B pairs against ``ref_commit`` (in a worktree).

    Each pair runs the full default bench once per side, alternating
    which side goes first, with SPARK_GRAFT_CRAWL_REPEAT=1 (a pair is
    already a repeat — min-of-3 inside each side would triple the
    wall-clock for no extra signal)."""
    import statistics

    repo = os.path.dirname(os.path.abspath(__file__))
    short = subprocess.run(
        ["git", "rev-parse", "--short", ref_commit], cwd=repo,
        capture_output=True, text=True, check=True).stdout.strip()
    wt = os.path.join("/tmp", f"derzis_ab_{short}")
    if not os.path.exists(os.path.join(wt, "bench.py")):
        subprocess.run(
            ["git", "worktree", "add", "--force", wt, ref_commit],
            cwd=repo, check=True, capture_output=True)
    env = {**os.environ, "SPARK_GRAFT_CRAWL_REPEAT": "1"}

    def one(bench_dir: str) -> dict:
        proc = subprocess.run(
            [sys.executable, os.path.join(bench_dir, "bench.py")],
            capture_output=True, text=True, check=True,
            cwd=bench_dir, env=env)
        return json.loads(proc.stdout.strip().splitlines()[-1])

    pair_rows = []
    for i in range(max(1, pairs)):
        order = ([("ref", wt), ("cur", repo)] if i % 2 == 0
                 else [("cur", repo), ("ref", wt)])
        res = {tag: one(d) for tag, d in order}
        common = sorted(set(res["ref"]["queries"])
                        & set(res["cur"]["queries"]))
        pair_rows.append({
            "order": [t for t, _ in order],
            "ref_suite_sec": res["ref"]["value"],
            "cur_suite_sec": res["cur"]["value"],
            "suite_ratio": round(
                res["cur"]["value"] / res["ref"]["value"], 3),
            "ref_crawl_ups": res["ref"]["crawl"]["urls_per_sec"],
            "cur_crawl_ups": res["cur"]["crawl"]["urls_per_sec"],
            "crawl_ratio": round(
                res["cur"]["crawl"]["urls_per_sec"]
                / res["ref"]["crawl"]["urls_per_sec"], 3),
            # store-ON crawl (both sides' default bench runs it)
            "crawl_snapshot_ratio": round(
                res["cur"]["crawl_snapshot"]["urls_per_sec"]
                / res["ref"]["crawl_snapshot"]["urls_per_sec"], 3)
            if "crawl_snapshot" in res["ref"]
            and "crawl_snapshot" in res["cur"] else None,
            "query_ratios": {
                q: round(res["cur"]["queries"][q]
                         / res["ref"]["queries"][q], 3)
                for q in common if res["ref"]["queries"][q]},
        })
    qnames = sorted(set().union(*[p["query_ratios"] for p in pair_rows]))
    print(json.dumps({
        "metric": f"interleaved A/B pairs vs {ref_commit} ({short})",
        "pairs": pair_rows,
        "suite_sec_ratio_median": round(statistics.median(
            p["suite_ratio"] for p in pair_rows), 3),
        "crawl_ups_ratio_median": round(statistics.median(
            p["crawl_ratio"] for p in pair_rows), 3),
        "crawl_snapshot_ups_ratio_median": round(statistics.median(
            p["crawl_snapshot_ratio"] for p in pair_rows
            if p["crawl_snapshot_ratio"] is not None), 3)
        if any(p["crawl_snapshot_ratio"] is not None
               for p in pair_rows) else None,
        "query_ratio_medians": {
            q: round(statistics.median(
                p["query_ratios"][q] for p in pair_rows
                if q in p["query_ratios"]), 3) for q in qnames},
        "note": "ratios are cur/ref: suite <1 and crawl >1 mean "
                "current is faster",
    }))


def _subprocess_json(args: list[str]) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)] + args,
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--crawl-only", action="store_true")
    ap.add_argument("--batch-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--fixture-dir", default=None)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--ab", metavar="REF_COMMIT", default=None)
    ap.add_argument("--ab-pairs", type=int, default=3)
    args = ap.parse_args()

    if args.ab:
        run_ab(args.ab, args.ab_pairs)
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = args.cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if args.scaling:
        fixture_dir = ensure_scale_fixture()
        n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
        results = {}
        for c in (n, 4 * n):
            # fewer repeats at the slow level keeps the whole run ~8 min
            rep = "2" if c == n else "3"
            results[c] = _subprocess_json(
                ["--batch-only", "--cores", str(c), "--repeat", rep,
                 "--fixture-dir", fixture_dir])
        t_n, t_4n = results[n]["urls_per_sec"], results[4 * n]["urls_per_sec"]
        eff = round((t_4n / t_n) / 4, 3) if t_n else None
        print(json.dumps({
            "metric": f"fetch+extract mega-round local[{n}] vs local[{4*n}]",
            f"local{n}": results[n], f"local{4*n}": results[4 * n],
            "speedup": round(t_4n / t_n, 3) if t_n else None,
            "efficiency": eff,
        }))
        return

    if args.batch_only:
        shuffle = cores * 3
    else:
        shuffle = max(8, cores)
    spark = build(cores, shuffle, split_mb=4 if args.batch_only else None)
    if args.batch_only:
        out = run_batch(spark, args.fixture_dir or ensure_scale_fixture(),
                        repeat=args.repeat)
        print(json.dumps({"cores": cores, **out}))
        return
    if args.crawl_only:
        crawl = run_crawl(spark)
        print(json.dumps({"cores": cores, **crawl}))
        return

    queries = run_queries(spark, sf_dir)
    fast = run_fast_variants(spark, sf_dir)
    new_ops = run_new_ops(spark, sf_dir)
    crawl = run_crawl(spark)
    # one store-attached run: the same loop paying the per-round
    # durable snapshot commit (delta chains) — the north rule's
    # "checkpoint every round to Iceberg snapshots" regime
    crawl_snapshot = run_crawl(spark, repeat=1, with_store=True)
    total = round(sum(queries.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        pass
    print(json.dumps({
        "metric": "headline query suite + crawl throughput",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "fast_variants": fast,
        "new_ops": new_ops,
        "sf": sf,
        "crawl": crawl,
        "crawl_snapshot": crawl_snapshot,
        "cores": cores,
    }))


if __name__ == "__main__":
    main()
