"""Recall evidence for the IVF ANN scheme (pipeline_queries.q_ann_ivf).

The driver-checked ``ann_topk`` row proves the Spark IVF top-10 is
value-identical to the DuckDB restatement for the canonical query
(vec_id=0, nprobe=3).  What that row cannot show is the QUALITY of the
approximation: how much of the exact brute-force top-10 the probed
cells retain, and what fraction of the corpus a probe scans.  Both are
properties of the SCHEME (which cells exist, which are probed, where
the true neighbors live) — not of the executing engine — so this
script replicates the scheme's math in numpy bit-for-bit at the
decision level (same stride-sampled k=sqrt(n) seeds, same cosine
assignment with the (cos DESC, cell ASC) tiebreak, same nprobe-nearest
probing), cross-checks the replication against the actual Spark
``q_ann_ivf`` output for the canonical query, then sweeps recall@10
and scan fraction over many query vectors and nprobe values on

  (a) the driver's sf embeddings table — ISOTROPIC random vectors,
      where every ANN structure is near-blind by construction (the
      nearest-neighbor cosine gap at d=64 is ~0.3 sigma, so "the
      right cell" barely exists), and
  (b) a PLANTED-CLUSTER corpus of the same shape (n vectors, d=64,
      C latent clusters, within-cluster noise), where real corpora
      live — embedding spaces of web text are strongly clustered —
      and where the scheme's recall must be (and is) high.

Usage:  python scripts/ann_recall.py [--sf /root/testdata/sf0.1]
                                     [--out BENCH/ann_recall_r4.json]

Output: one JSON file with the sweep results + the Spark cross-check.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import pyarrow.parquet as pq


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _assign(emb: np.ndarray, cent: np.ndarray) -> np.ndarray:
    cn = np.linalg.norm(cent, axis=1)
    en = np.linalg.norm(emb, axis=1)
    cos = np.round(emb @ cent.T / np.outer(en, cn), 4)
    # argmax with cell-ascending tiebreak == first max along axis 1
    return cos.argmax(axis=1)


def ivf_scheme(emb: np.ndarray, iters: int = 0):
    """Replicate ivf_topk's scheme: stride-seeded k=sqrt(n) cells +
    cosine assignment with round-4 rounding and (cos DESC, cell ASC)
    argmax tiebreak, plus ``iters`` Lloyd refinements (per-dimension
    cell means rounded to 6, empty cells dropped — identical
    quantization to the Spark/DuckDB pair). Returns (centroids,
    cell_of_vector); after Lloyd, centroid row r is the r-th SURVIVING
    cell in original cell order, matching the relabeling-free engines
    only in geometry (cell IDs are not compared across engines here —
    recall depends on membership, not labels)."""
    n = emb.shape[0]
    k = max(2, math.ceil(math.sqrt(n)))
    s = max(1, n // k)
    cent = emb[[i for i in range(0, k * s, s)]].copy()
    for _ in range(iters):
        cells = _assign(emb, cent)
        cent = np.stack([
            np.round(emb[cells == c].mean(axis=0), 6)
            for c in range(cent.shape[0]) if (cells == c).any()])
    return cent, _assign(emb, cent)


def probe_cells(q: np.ndarray, cent: np.ndarray, nprobe: int):
    qn = np.linalg.norm(q)
    cn = np.linalg.norm(cent, axis=1)
    qcos = np.round(cent @ q / (cn * qn), 4)
    # (qcos DESC, cell ASC): stable sort on -qcos keeps cell order
    order = np.argsort(-qcos, kind="stable")
    return set(order[:nprobe].tolist())


def topk_exact(emb: np.ndarray, qid: int, k: int = 10):
    q = emb[qid]
    cos = np.round(
        emb @ q / (np.linalg.norm(emb, axis=1) * np.linalg.norm(q)), 4)
    ids = [i for i in np.lexsort((np.arange(len(cos)), -cos))
           if i != qid][:k]
    return ids


def sweep(emb: np.ndarray, queries, nprobes, label: str,
          iters: int = 0):
    cent, cells = ivf_scheme(emb, iters=iters)
    n = emb.shape[0]
    cell_sizes = np.bincount(cells, minlength=cent.shape[0])
    rows = []
    for nprobe in nprobes:
        recalls, scans = [], []
        for qid in queries:
            truth = set(topk_exact(emb, qid))
            probed = probe_cells(emb[qid], cent, nprobe)
            mask = np.isin(cells, list(probed))
            cand = set(np.nonzero(mask)[0].tolist()) - {qid}
            recalls.append(len(truth & cand) / len(truth))
            scans.append(int(cell_sizes[list(probed)].sum()) / n)
        rows.append({
            "corpus": label, "n": int(n), "k_cells": int(cent.shape[0]),
            "lloyd_iters": int(iters), "nprobe": int(nprobe),
            "recall_at_10": round(float(np.mean(recalls)), 4),
            "scan_fraction": round(float(np.mean(scans)), 4),
        })
    return rows


def planted_corpus(n: int, d: int = 64, n_clusters: int = 32,
                   sigma: float = 0.35, seed: int = 7) -> np.ndarray:
    """Deterministic clustered corpus: C unit-Gaussian centers, each
    vector = its cluster center + sigma * noise (cluster of vector i =
    i % C, so the stride-sampled IVF seeds hit every cluster)."""
    rng = np.random.default_rng(seed)
    centers = _normalize(rng.standard_normal((n_clusters, d)))
    assign = np.arange(n) % n_clusters
    noise = rng.standard_normal((n, d)) * sigma
    return (centers[assign] + noise).astype(np.float64)


def _numpy_top10(emb: np.ndarray, iters: int):
    cent, cells = ivf_scheme(emb, iters=iters)
    probed = probe_cells(emb[0], cent, 3)
    mask = np.isin(cells, list(probed))
    cand = [i for i in np.nonzero(mask)[0].tolist() if i != 0]
    q = emb[0]
    cos = np.round(emb[cand] @ q /
                   (np.linalg.norm(emb[cand], axis=1) * np.linalg.norm(q)),
                   4)
    order = np.lexsort((np.array(cand), -cos))
    return [int(cand[i]) for i in order[:10]]


def spark_crosscheck(sf_dir: str, emb: np.ndarray) -> dict:
    """Run the real Spark q_ann_ivf / q_ann_ivf_lloyd at sf_dir and
    assert their top-10 vec_ids equal the numpy replication's (cells +
    nprobe=3 probe + exact top-10 within probed cells) for vec_id=0.
    Lloyd cell LABELS differ (numpy compacts survivors, the engines
    keep original IDs) but the relabeling preserves order, so every
    (…, cell ASC) tiebreak resolves identically — vec_id sets are the
    comparable surface."""
    from pyspark.sql import SparkSession
    from derzis_spark import pipeline_queries as P

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .appName("ann-recall-crosscheck").getOrCreate())
    try:
        got0 = [r["vec_id"] for r in
                P.q_ann_ivf(spark, sf_dir).orderBy("rank").collect()]
        got2 = [r["vec_id"] for r in
                P.q_ann_ivf_lloyd(spark, sf_dir)
                .orderBy("rank").collect()]
    finally:
        spark.stop()

    want0 = _numpy_top10(emb, 0)
    want2 = _numpy_top10(emb, 2)
    return {"spark_top10": got0, "numpy_top10": want0,
            "match": got0 == want0,
            "spark_top10_lloyd2": got2, "numpy_top10_lloyd2": want2,
            "match_lloyd2": got2 == want2}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="BENCH/ann_recall_r4.json")
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--skip-spark", action="store_true")
    args = ap.parse_args()

    tbl = pq.read_table(f"{args.sf}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    df = tbl.to_pandas().sort_values("vec_id")
    assert (df["vec_id"].to_numpy() == np.arange(len(df))).all(), \
        "vec_ids must be dense 0..n-1 for positional replication"
    emb = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    n = emb.shape[0]

    qrng = np.random.default_rng(13)
    queries = sorted(qrng.choice(n, size=min(args.queries, n),
                                 replace=False).tolist())
    nprobes = [1, 3, 5, 10, 20]

    out = {"sf": args.sf, "n_queries": len(queries), "sweeps": []}
    for iters in (0, 2):
        out["sweeps"] += sweep(emb, queries, nprobes, "sf_isotropic",
                               iters=iters)
    # cluster tightness sweep: noise NORM at d=64 is sigma*8, so
    # sigma=0.35 is noise-dominated (effectively isotropic) while
    # sigma<=0.1 is the regime real text-embedding corpora live in
    for sigma in (0.35, 0.2, 0.1, 0.05):
        planted = planted_corpus(n, sigma=sigma)
        for iters in (0, 2):
            out["sweeps"] += sweep(planted, queries, nprobes,
                                   f"planted_32c_sigma{sigma}",
                                   iters=iters)

    if not args.skip_spark:
        out["spark_crosscheck"] = spark_crosscheck(args.sf, emb)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    for r in out["sweeps"]:
        print(r)
    if "spark_crosscheck" in out:
        print("spark==numpy replication:",
              out["spark_crosscheck"]["match"],
              "(lloyd2:", out["spark_crosscheck"]["match_lloyd2"], ")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
