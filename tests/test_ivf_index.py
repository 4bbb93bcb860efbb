"""Materialized IVF index (build_ivf_index / probe_ivf_index): the
partition-pruning claim in q_ann_ivf's docstring, pinned on the
executed plan.

At 100 TB the IVF win is not the post-scan filter — it is that a
cell-partitioned corpus lets the probe's literal ``cell IN (…)``
filter prune at the DIRECTORY level, so only nprobe/k of the bytes
are ever read. These tests build the index on disk, probe it, and
assert (a) the scan's PartitionFilters carry the cell predicate with
no post-scan cell filter left behind, (b) the probe reads strictly
fewer files than the full index holds, and (c) the ranking is
identical to the non-materialized ivf_topk at the same parameters.
"""

import re

from derzis_spark import pipeline_queries as P

from tests.test_pipeline_scale import _clustered_rows, _write_fixture


def _build(spark, tmp_path, n=400):
    sf_dir = _write_fixture(spark, tmp_path, _clustered_rows(n))
    e = P.load(spark, sf_dir, "embeddings")
    path = f"{sf_dir}/ivf_index"
    cent = P.build_ivf_index(e, path, iters=2)
    return e, path, cent


def test_probe_prunes_partitions(spark, tmp_path):
    e, path, cent = _build(spark, tmp_path)
    out = P.probe_ivf_index(spark, path, cent, nprobe=3)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", scan)
    assert m and "cell" in m.group(1), scan
    # the cell predicate is fully consumed by pruning — no residual
    # post-scan filter on cell (DataFilters may hold vec_id/null
    # checks, never cell)
    dm = re.search(r"DataFilters: \[([^\]]*)\]", scan)
    assert dm is None or "cell" not in dm.group(1), scan


def test_probe_reads_fewer_files_than_full_scan(spark, tmp_path):
    e, path, cent = _build(spark, tmp_path)
    out = P.probe_ivf_index(spark, path, cent, nprobe=3)
    pruned = out._jdf.queryExecution().executedPlan().toString()
    full = (spark.read.parquet(path)
            ._jdf.queryExecution().executedPlan().toString())

    def n_files(plan):
        # "... 5 paths)" is not emitted; count via the metadata line
        m = re.search(r"numFiles: (\d+)", plan)
        return int(m.group(1)) if m else None

    np_, nf = n_files(pruned), n_files(full)
    if np_ is not None and nf is not None:
        assert np_ < nf, (np_, nf)
    else:
        # fall back: partition count via listing
        import os
        cells = [d for d in os.listdir(path) if d.startswith("cell=")]
        probed = {r["cell"] for r in out.select("cell").collect()}
        assert len(probed) <= 3 < len(cells)


def test_probe_matches_unmaterialized_search(spark, tmp_path):
    e, path, cent = _build(spark, tmp_path)
    got = [tuple(r) for r in
           P.probe_ivf_index(spark, path, cent, nprobe=3)
           .orderBy("rank").collect()]
    want = [tuple(r) for r in
            P.ivf_topk(e, iters=2, nprobe=3).orderBy("rank").collect()]
    assert got == want
