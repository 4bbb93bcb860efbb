"""Mega-round fetch+extract as one distributed job — the 10^10-scale
execution regime.

At a 10^10-URL frontier a single crawl round schedules millions of
URLs, so the per-round fixed costs (job launches, driver bookkeeping)
that dominate tiny sandbox rounds amortize to nothing; what remains is
exactly this job: scheduled frontier → robots gate (Arrow UDF,
executor-side) → fetch join vs the pages table → text extraction +
RDF parse (Arrow UDFs) → quad validity filter → node discovery
(canonicalize + distinct). Reference pipeline equivalents:
fetch worker/src/lib/Worker.ts:697-728, robots gate Worker.ts:415-423,
parse worker/src/lib/parse-rdf.ts:11-26, filter Worker.ts:599-657,
discovery manager/src/lib/Manager.ts:352-410.

Nothing here ever touches the driver row-wise: the result is a single
aggregate action, so throughput scales with executor parallelism. This
is the job `bench.py --scaling` runs at N and 4N cores for the
scaling-efficiency evidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from derzis_spark.functions import udfs


def fetch_extract_stats(
    spark: SparkSession,
    frontier: DataFrame,
    pages: DataFrame,
    robots: DataFrame,
    user_agent: str = "derzis-spark",
    allow_blank_nodes: bool = False,
) -> DataFrame:
    """Per-URL fetch+extract results: one row per fetched page with the
    extracted text length, parsed/valid triple counts, and discovered
    out-node count. ``frontier`` needs columns (url, origin).

    The plan shape is the scale-correct one: robots is a broadcast
    dimension join, the fetch is an equi-join on url (bucket-colocated
    on url_hash at cluster scale), and every per-row step is an
    Arrow-vectorized UDF or built-in expression.
    """
    robots_allows = udfs.make_robots_allows(user_agent)
    dim = robots.select(
        "origin",
        F.when(F.col("status") == "ok", F.col("robots_txt"))
        .otherwise(F.lit("")).alias("robots_txt"),
    )
    gated = (
        frontier.join(F.broadcast(dim), "origin", "left")
        .withColumn("robots_txt", F.coalesce("robots_txt", F.lit("")))
        .filter(robots_allows(F.col("robots_txt"), F.col("url")))
        .select("url", "origin")
    )
    fetched = gated.join(pages, "url").select(
        "url", "origin",
        udfs.extract_text(F.col("html")).alias("text"),
        udfs.parse_page_triples(F.col("html")).alias("raw_triples"),
    )
    q = fetched.select(
        "url", "origin",
        F.length("text").alias("text_len"),
        F.size("raw_triples").alias("n_raw"),
        F.explode_outer("raw_triples").alias("t"),
    ).select("url", "origin", "text_len", "n_raw", "t.*")
    subj_is_blank = F.col("subject").startswith("_:")
    obj_is_blank = F.col("object_kind") == "blank"
    valid = (F.col("object_value") != "")
    if not allow_blank_nodes:
        valid = valid & ~subj_is_blank & ~obj_is_blank
    q = q.withColumn("is_valid", F.coalesce(valid, F.lit(False)))
    node = F.when(
        F.col("is_valid") & (F.col("object_kind") == "uri"),
        udfs.canonicalize_url(F.col("object_value")),
    )
    q = q.withColumn("out_node", node)
    return q.groupBy("url", "origin", "text_len", "n_raw").agg(
        F.sum(F.col("is_valid").cast("int")).alias("n_valid"),
        F.count_distinct("out_node").alias("n_out_nodes"),
    )


def fetch_extract_stats_fused(
    spark: SparkSession,
    frontier: DataFrame | None,
    pages: DataFrame,
    robots: DataFrame,
    user_agent: str = "derzis-spark",
    allow_blank_nodes: bool = False,
) -> DataFrame:
    """Same result as ``fetch_extract_stats`` with the whole per-page
    pipeline fused into ONE Arrow UDF: extract → parse → validity
    filter → out-node canonicalization+dedup all happen per page inside
    the batch, so the plan has a single shuffle (the fetch join) and no
    30x row-multiplying explode between stages. This is the kernel the
    scaling bench runs — per-page work dominates and parallelism is
    limited only by scan/join partitioning."""
    robots_allows = udfs.make_robots_allows(user_agent)
    page_stats = udfs.make_page_stats(allow_blank_nodes)

    dim = robots.select(
        "origin",
        F.when(F.col("status") == "ok", F.col("robots_txt"))
        .otherwise(F.lit("")).alias("robots_txt"),
    )
    if frontier is None:
        # full-corpus mega-round: the schedule IS the pages table, so
        # the fetch join is the identity and the only join left is the
        # broadcast robots dimension — the plan a bucket-colocated
        # (Iceberg url_hash) fetch join degenerates to at full coverage
        src = pages.select(
            "url", udfs.url_origin(F.col("url")).alias("origin"), "html")
    else:
        gated = (
            frontier.join(F.broadcast(dim), "origin", "left")
            .withColumn("robots_txt", F.coalesce("robots_txt", F.lit("")))
            .filter(robots_allows(F.col("robots_txt"), F.col("url")))
            .select("url", "origin")
        )
        # fetch join with the pages side shuffle-free: at cluster scale
        # this is a storage-partitioned (url_hash-bucketed) join; in the
        # sandbox the equivalent plan broadcasts the schedule side —
        # shuffling the html-bearing side would move the whole corpus
        return pages.join(F.broadcast(gated), "url").select(
            "url", "origin", page_stats(F.col("html")).alias("s")
        ).select("url", "origin", "s.*")
    return (
        src.join(F.broadcast(dim), "origin", "left")
        .withColumn("robots_txt", F.coalesce("robots_txt", F.lit("")))
        .filter(robots_allows(F.col("robots_txt"), F.col("url")))
        .select("url", "origin", page_stats(F.col("html")).alias("s"))
        .select("url", "origin", "s.*")
    )


def fetch_extract_batch(
    spark: SparkSession,
    frontier: DataFrame,
    pages: DataFrame,
    robots: DataFrame,
    user_agent: str = "derzis-spark",
    allow_blank_nodes: bool = False,
    fused: bool = False,
) -> dict:
    """Run the mega-round and reduce to totals in a single action."""
    fn = fetch_extract_stats_fused if fused else fetch_extract_stats
    stats = fn(
        spark, frontier, pages, robots, user_agent, allow_blank_nodes)
    row = stats.agg(
        F.count("*").alias("fetched"),
        F.sum("text_len").alias("text_bytes"),
        F.sum("n_raw").alias("raw_triples"),
        F.sum("n_valid").alias("valid_triples"),
        F.sum("n_out_nodes").alias("out_nodes"),
    ).collect()[0]
    return {k: (int(row[k]) if row[k] is not None else 0)
            for k in row.asDict()}
