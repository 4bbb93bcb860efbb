#!/usr/bin/env python
"""WARC connector throughput: write the scaling fixture's pages out
as sharded ``.warc.gz`` via the distributed sink, then measure the
source's full-scan read (parse every record, count + sum payload
bytes) at two parallelism levels — the same two-cluster-size protocol
as ``bench.py --scaling``.

Usage: python scripts/warc_bench.py [--shards 64] [--cores-low 8]
       [--cores-high 32]
Emits one JSON line → BENCH/warc_r4.json (by redirect).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WARC_DIR = os.environ.get("SPARK_GRAFT_WARC_CACHE",
                          "/tmp/derzis_warc_bench")


def ensure_archive(shards: int) -> dict:
    """Write the scale fixture to sharded warc.gz once; reuse after."""
    import bench
    from derzis_spark.engine import build_session
    from derzis_spark.sources.warc import write_warc_df

    marker = os.path.join(WARC_DIR, ".complete")
    if os.path.exists(marker):
        return json.load(open(marker))
    fixture_dir = bench.ensure_scale_fixture()
    spark = build_session(app="warc-write", cores=16,
                          shuffle_partitions=shards)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(
        os.path.join(fixture_dir, "pages.parquet"))
    t0 = time.time()
    man = write_warc_df(
        pages.repartition(shards, "url"), WARC_DIR).collect()
    info = {
        "shards": len(man),
        "records": sum(m["n_records"] for m in man),
        "bytes": sum(
            os.path.getsize(os.path.join(WARC_DIR, m["warc_file"]))
            for m in man),
        "write_sec": round(time.time() - t0, 2),
    }
    spark.stop()
    json.dump(info, open(marker, "w"))
    return info


def read_run(cores: int, scan_times: int = 3,
             repeat: int = 2) -> dict:
    """Full-scan read at one parallelism level. The archive is listed
    ``scan_times``× (same files re-parsed — decompress+parse work
    scales, page cache warm on every pass) so the measured region
    amortizes job-submission and python-worker startup; min-of-
    ``repeat`` drops first-run JIT noise, the same discipline as
    bench.py's min-of-N."""
    import glob as g

    from derzis_spark.engine import build_session
    from derzis_spark.sources.warc import read_warc
    from pyspark.sql import functions as F

    spark = build_session(app="warc-read", cores=cores,
                          shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    files = sorted(g.glob(os.path.join(WARC_DIR, "*.warc.gz")))
    best = None
    for _ in range(repeat):
        t0 = time.time()
        df = read_warc(spark, files * scan_times,
                       parallelism=cores * 4)
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.length("html")).alias("payload_bytes")).collect()[0]
        dt = time.time() - t0
        if best is None or dt < best:
            best, n, pb = dt, row["n"], int(row["payload_bytes"])
    spark.stop()
    return {"cores": cores, "records": n, "payload_bytes": pb,
            "sec": round(best, 2),
            "records_per_sec": round(n / best, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--cores-low", type=int, default=8)
    ap.add_argument("--cores-high", type=int, default=32)
    args = ap.parse_args()
    info = ensure_archive(args.shards)
    lo = read_run(args.cores_low)
    hi = read_run(args.cores_high)
    ratio = args.cores_high / args.cores_low
    eff = round((hi["records_per_sec"] / lo["records_per_sec"])
                / ratio, 3)
    print(json.dumps({
        "metric": "warc source full-scan read throughput",
        "archive": info,
        f"local{args.cores_low}": lo,
        f"local{args.cores_high}": hi,
        "speedup": round(
            hi["records_per_sec"] / lo["records_per_sec"], 3),
        "efficiency_vs_cores": eff,
    }))


if __name__ == "__main__":
    main()
