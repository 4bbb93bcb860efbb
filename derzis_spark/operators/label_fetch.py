"""Label-fetch secondary queue — one batch round over a resource_labels
table (the reference's externally-fed ResourceLabel collection,
models/src/ResourceLabel.ts:14-36; labels enter via the API route
manager/src/routes/api/processes/[pid]/labels/+server.ts:76, NOT the
crawl loop, so this is a standalone batch operator rather than a crawl
phase).

Batching mirrors ``Domain.labelsToFetch`` (models/src/Domain.ts:610-731)
restated deterministically for the round model:

- per domain, the first ``resources_per_domain`` NEW labels in
  ``created_seq`` order (the generator's createdAt pagination);
- domains that accumulate a FULL batch are served first, ordered by
  the seq at which they filled (the generator yields them as soon as
  they qualify during pagination); partially-filled domains follow at
  stream end (Domain.ts:717-730), ordered by their first label's seq;
- at most ``domain_limit`` domains per round (worker capacity).

The fetch half mirrors ``Worker.fetchDomainLabels``
(worker/src/lib/Worker.ts:277-340) + ``Manager.saveLabelFetch``
(Manager.ts:280-310): robots gate → pages-table join → parse → keep
only rdfs:label/comment literals with the per-subject language
preference (en, else tag-less; Manager.getLabelTriples,
Manager.ts:418-448) → label status done/error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from derzis_spark.config import LABEL_PREDICATES
from derzis_spark.functions import udfs

RDFS_LABEL, RDFS_COMMENT = LABEL_PREDICATES


def upsert_labels(labels: DataFrame, incoming: DataFrame) -> DataFrame:
    """ResourceLabel.upsertMany (models/src/ResourceLabel.ts:45-128):

    - incoming rows are deduped by (pid, url), LAST occurrence wins
      (the reference's Map overwrite) — ``arrival_seq`` carries the
      array order;
    - unseen (pid, url) insert with status 'new';
    - existing rows with status 'done' are preserved untouched;
    - existing 'new'/'error' rows take the incoming domain and upgrade
      ``source`` web→cardea and ``extend`` false→true (never the
      reverse, ResourceLabel.ts:108-115).

    ``labels``: (pid, url, domain, source, extend, status);
    ``incoming``: (pid, url, domain, source, extend, arrival_seq) —
    domain precomputed by the caller (the reference derives it from the
    URL origin at upsert time, ResourceLabel.ts:63-76)."""
    inc = (
        incoming.groupBy("pid", "url")
        .agg(F.max_by(F.struct("domain", "source", "extend"),
                      F.col("arrival_seq")).alias("_l"))
        .select("pid", "url", F.col("_l.domain").alias("i_domain"),
                F.col("_l.source").alias("i_source"),
                F.col("_l.extend").alias("i_extend"))
    )
    j = labels.withColumnRenamed("domain", "l_domain") \
        .withColumnRenamed("source", "l_source") \
        .withColumnRenamed("extend", "l_extend") \
        .withColumnRenamed("status", "l_status") \
        .join(inc, ["pid", "url"], "full_outer")
    is_new = F.col("l_status").isNull()
    keep = (F.col("l_status") == "done") | F.col("i_source").isNull()
    return j.select(
        "pid", "url",
        F.when(is_new | ~keep, F.col("i_domain"))
         .otherwise(F.col("l_domain")).alias("domain"),
        F.when(is_new, F.col("i_source"))
         .when(keep, F.col("l_source"))
         .when((F.col("l_source") == "web")
               & (F.col("i_source") == "cardea"), F.lit("cardea"))
         .otherwise(F.col("l_source")).alias("source"),
        F.when(is_new, F.col("i_extend"))
         .when(keep, F.col("l_extend"))
         .otherwise(F.col("l_extend") | F.col("i_extend")).alias("extend"),
        F.when(is_new, F.lit("new"))
         .otherwise(F.col("l_status")).alias("status"),
    )


def pending_cardea_labels(labels: DataFrame) -> DataFrame:
    """The compound-index probe (ResourceLabel.ts:18, used to decide
    whether a process still waits on cardea: pid+status+source+extend):
    not-done cardea labels that do NOT extend paths."""
    return labels.filter(
        (F.col("source") == "cardea") & (F.col("extend") == False)  # noqa: E712
        & (F.col("status") != "done"))


def select_label_batch(labels: DataFrame, resources_per_domain: int = 20,
                       domain_limit: int | None = None) -> DataFrame:
    """Deterministic restatement of Domain.labelsToFetch: returns the
    (domain, url, created_seq) rows scheduled this round."""
    new = labels.filter(F.col("status") == "new")
    per_dom = Window.partitionBy("domain").orderBy("created_seq")
    kept = (new.withColumn("rk", F.row_number().over(per_dom))
            .filter(F.col("rk") <= resources_per_domain))
    dom_stats = kept.groupBy("domain").agg(
        F.count("*").alias("n"),
        F.max("created_seq").alias("seq_reached"),
        F.min("created_seq").alias("first_seq"))
    full = F.col("n") >= resources_per_domain
    ranked = dom_stats.select(
        "domain",
        F.when(full, F.lit(0)).otherwise(F.lit(1)).alias("tier"),
        F.when(full, F.col("seq_reached"))
         .otherwise(F.col("first_seq")).alias("order_seq"))
    if domain_limit is not None:
        # parallel top-k over domains (TakeOrderedAndProject)
        ranked = ranked.orderBy("tier", "order_seq", "domain") \
            .limit(domain_limit)
    return kept.join(F.broadcast(ranked.select("domain")), "domain") \
        .select("domain", "url", "created_seq")


def label_fetch_round(spark: SparkSession, labels: DataFrame,
                      pages: DataFrame, robots: DataFrame,
                      resources_per_domain: int = 20,
                      domain_limit: int | None = None,
                      user_agent: str = "derzis-spark",
                      ) -> tuple[DataFrame, DataFrame]:
    """Run one label-fetch round. Returns (updated_labels,
    label_triples): label rows transition new→done/error; label_triples
    carries the kept rdfs:label/comment literals per fetched url."""
    batch = select_label_batch(labels, resources_per_domain, domain_limit)
    robots_allows = udfs.make_robots_allows(user_agent)
    gated = (
        batch.join(F.broadcast(
            robots.select(F.col("origin").alias("domain"),
                          "robots_txt")), "domain", "left")
        .withColumn("allowed", robots_allows(
            F.coalesce(F.col("robots_txt"), F.lit("")), F.col("url")))
    )
    fetched = (
        gated.filter("allowed")
        .join(pages.select("url", "html"), "url", "left")
        .select(
            "domain", "url",
            F.col("html").isNotNull().alias("found"),
            udfs.parse_page_triples(F.col("html")).alias("raw_triples"))
    )
    fetched = fetched.localCheckpoint(eager=True)
    # label triples with language preference (Manager.ts:418-448):
    # per subject prefer language == 'en'; else keep tag-less only
    lt = (
        fetched.filter("found")
        .select(F.col("url").alias("source"),
                F.explode("raw_triples").alias("t"))
        .select("source", "t.*")
        .filter(F.col("predicate").isin(*LABEL_PREDICATES)
                & (F.col("object_kind") == "literal")
                & (F.col("object_value") != ""))
    )
    has_en = F.max(
        F.coalesce((F.col("object_language") == "en").cast("int"),
                   F.lit(0))
    ).over(Window.partitionBy("source", "subject"))
    label_triples = (
        lt.withColumn("has_en", has_en)
        .filter(((F.col("has_en") == 1)
                 & (F.col("object_language") == "en"))
                | ((F.col("has_en") == 0)
                   & F.col("object_language").isNull()))
        .drop("has_en")
    )
    # status transitions: done when fetched; error on robots-denied or
    # missing page (saveLabelFetch, Manager.ts:280-310)
    outcome = (
        gated.select("url", "allowed")
        .join(fetched.select("url", "found"), "url", "left")
        .select(
            "url",
            F.when(F.col("allowed") & F.coalesce("found", F.lit(False)),
                   F.lit("done")).otherwise(F.lit("error"))
            .alias("new_status"))
    )
    updated = (
        labels.join(F.broadcast(outcome), "url", "left")
        .withColumn("status", F.coalesce("new_status", "status"))
        .drop("new_status")
    )
    return updated, label_triples
