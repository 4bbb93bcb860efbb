#!/usr/bin/env python
"""Extra benchmarks (round 6): per-operator noop-sink isolation.

``bench.py`` is FROZEN for the driver's measurement; this harness is
the optimization-loop instrument (guide §1.4): it times each query
with ``df.write.format("noop")`` so every column of every row is
computed and nothing is skipped by count()-pruning, labels each job
(guide §1.5), and prints one JSON line. Not part of the driver
contract.

Usage::

  python bench_extra.py [--sf-dir D] [--cores N] [--repeat K] \
      [--ops name1,name2,...]

Ops default to the bench.py HEADLINE + fast_variants + new_ops lists.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def op_table():
    from derzis_spark import pipeline_queries as P
    import __spark_entry__ as entry_mod

    qs = dict(entry_mod.queries())
    qs.update({
        "jaccard_lsh_pairs": P.q_jaccard_lsh_pairs,
        "jaccard_shingle_pairs": P.q_jaccard_shingle_pairs,
        "ann_bruteforce_cosine": P.q_ann_bruteforce_cosine,
        "ann_ivf": P.q_ann_ivf,
        "ann_ivf_lloyd2": P.q_ann_ivf_lloyd,
        "doc_fingerprint": P.q_doc_fingerprint,
        "quality_score": P.q_quality_score,
        "winnow_fingerprint": P.q_winnow_fingerprint,
        "segment_dedup": P.q_segment_dedup,
        "cdc_segment_dedup": P.q_cdc_segment_dedup,
        "tfidf_top_terms": P.q_tfidf_top_terms,
        "train_split": P.q_train_split,
        "pii_scrub": P.q_pii_scrub,
        "corpus_mix": P.q_corpus_mix,
        "lang_id_trigram": P.q_lang_id,
        "minhash64_signatures_fast": P.q_minhash64_signatures_fast,
        "simhash64_near_dup_fast": P.q_simhash64_near_dup_fast,
    })
    return qs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--ops", default=None,
                    help="comma-separated op names (default: bench.py lists)")
    args = ap.parse_args()

    from derzis_spark.engine import build_session
    spark = build_session(app="derzis-bench-extra", cores=args.cores,
                          shuffle_partitions=max(8, args.cores),
                          adaptive=True)
    spark.sparkContext.setLogLevel("ERROR")

    qs = op_table()
    if args.ops:
        names = [n for n in args.ops.split(",") if n]
    else:
        import bench
        names = (bench.HEADLINE
                 + ["minhash64_signatures_fast", "simhash64_near_dup_fast",
                    "ann_ivf_lloyd2"]
                 + ["simhash_near_dup", "dedup_clusters",
                    "winnow_fingerprint", "jaccard_shingle_pairs",
                    "text_stats", "decontaminate", "segment_dedup",
                    "tfidf_top_terms", "train_split", "pii_scrub",
                    "corpus_mix", "cdc_segment_dedup", "lang_id_trigram"])
    # warm the JVM/parquet reader once (mirrors bench.py)
    for t in ("region", "documents", "events"):
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).count()
            break
    spark.range(1000).selectExpr("sum(id)").collect()

    out, samples = {}, {}
    for name in names:
        fn = qs[name]
        best = None
        runs = []
        for _ in range(max(1, args.repeat)):
            spark.sparkContext.setJobDescription(f"noop: {name}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop") \
                .mode("overwrite").save()
            dt = time.time() - t0
            runs.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        samples[name] = runs
        print(f"# {name}: {out[name]} {runs}", file=sys.stderr)
    print(json.dumps({"metric": "noop-isolated per-op seconds (min-of-N)",
                      "unit": "sec", "sf_dir": args.sf_dir,
                      "cores": args.cores, "repeat": args.repeat,
                      "ops": out, "samples": samples}))


if __name__ == "__main__":
    main()
