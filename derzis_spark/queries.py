"""Driver-contract queries: SURVEY.md §2 operator shapes + the
training-data-pipeline operators, each expressed twice —

- a Spark DataFrame callable ``(spark, sf_dir) -> DataFrame``
- an equivalent ANSI-SQL string DuckDB runs on the same parquet views

Both sides alias every computed column identically; floats are rounded
inside the query so the driver's order-insensitive value-hash matches
exactly. The crawl-shaped operators run over a *derived* crawl substrate
(urls/links/paths built deterministically from the ``documents`` table
with pure column arithmetic) so the oracle can reproduce them in SQL.

The real multi-round crawl engine (derzis_spark.engine) is exercised by
the ``crawl_*`` entries, which are iterative and therefore rows-only
checks (no oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# derived crawl substrate (documents → pages / links / paths)
# ---------------------------------------------------------------------------

def pages_view(spark, sf_dir) -> DataFrame:
    """documents → Common-Crawl-style page rows (url, origin, text, lang)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.org")).alias("origin"),
        "doc_id", "text", "lang", "n_chars",
    )

PAGES_SQL = """
  SELECT 'https://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
         'https://' || source || '.example.org' AS origin,
         doc_id, text, lang, n_chars
  FROM documents
"""


def links_view(spark, sf_dir) -> DataFrame:
    """Deterministic synthetic link graph: doc i → (i*7 + j*13) mod N for
    j∈{1,2,3}, with predicate p{(i+j) mod 5}. The analog of outlink
    triples extracted per page (worker/src/lib/parse-rdf.ts:11-26)."""
    p = pages_view(spark, sf_dir)
    n = p.count()
    j = spark.range(1, 4).select(F.col("id").alias("j"))
    src = p.select(F.col("url").alias("src_url"),
                   F.col("origin").alias("src_origin"),
                   F.col("doc_id").alias("src_doc"))
    links = src.crossJoin(j).select(
        "src_url", "src_origin", "src_doc", "j",
        ((F.col("src_doc") * 7 + F.col("j") * 13) % F.lit(n)).alias("dst_doc"),
        F.concat(F.lit("http://example.org/pred/p"),
                 ((F.col("src_doc") + F.col("j")) % 5).cast("string")
                 ).alias("predicate"),
    )
    dst = p.select(F.col("doc_id").alias("dst_doc"),
                   F.col("url").alias("dst_url"),
                   F.col("origin").alias("dst_origin"))
    return links.join(dst, "dst_doc")

LINKS_SQL = f"""
  WITH pages AS ({PAGES_SQL}),
  raw AS (
    SELECT p.url AS src_url, p.origin AS src_origin, p.doc_id AS src_doc, t.j,
           (p.doc_id * 7 + t.j * 13) % (SELECT COUNT(*) FROM pages) AS dst_doc,
           'http://example.org/pred/p' || CAST((p.doc_id + t.j) % 5 AS VARCHAR) AS predicate
    FROM pages p CROSS JOIN (VALUES (1), (2), (3)) AS t(j)
  )
  SELECT r.dst_doc, r.src_url, r.src_origin, r.src_doc, r.j, r.predicate,
         d.url AS dst_url, d.origin AS dst_origin
  FROM raw r JOIN pages d ON d.doc_id = r.dst_doc
"""


def paths_view(spark, sf_dir) -> DataFrame:
    """Deterministic frontier-path rows derived from documents:
    priority key fields (length, created_round, seq) as in the engine's
    ``paths`` table (SURVEY §1.2)."""
    p = pages_view(spark, sf_dir)
    return p.select(
        F.col("url").alias("head_url"),
        F.col("origin"),
        ((F.col("doc_id") % 4) + 1).cast("int").alias("length"),
        (F.col("doc_id") % 3).cast("int").alias("created_round"),
        F.col("doc_id").alias("seq"),
    )

PATHS_SQL = f"""
  WITH pages AS ({PAGES_SQL})
  SELECT url AS head_url, origin,
         CAST(doc_id % 4 + 1 AS INT) AS length,
         CAST(doc_id % 3 AS INT) AS created_round,
         doc_id AS seq
  FROM pages
"""


# ---------------------------------------------------------------------------
# §2.1 sources/sinks + §3.1 seed bootstrap
# ---------------------------------------------------------------------------

def q_seed_insert(spark, sf_dir):
    """Seed insertion shape (models/src/Resource.ts:306-331): first 8
    pages by doc_id become unvisited resources + their domains."""
    p = pages_view(spark, sf_dir)
    seeds = p.orderBy("doc_id").limit(8)
    return seeds.select(
        "url", "origin", F.lit("unvisited").alias("status"))

SQL_SEED_INSERT = f"""
  WITH pages AS ({PAGES_SQL})
  SELECT url, origin, 'unvisited' AS status
  FROM pages ORDER BY doc_id LIMIT 8
"""


def q_ntriples_export(spark, sf_dir):
    """N-Triples export sink (manager triples.nt.gz route): format link
    triples as NT lines."""
    l = links_view(spark, sf_dir)
    return l.select(
        F.concat(F.lit("<"), F.col("src_url"), F.lit("> <"),
                 F.col("predicate"), F.lit("> <"), F.col("dst_url"),
                 F.lit("> .")).alias("nt_line"))

SQL_NTRIPLES_EXPORT = f"""
  WITH links AS ({LINKS_SQL})
  SELECT '<' || src_url || '> <' || predicate || '> <' || dst_url || '> .' AS nt_line
  FROM links
"""


# ---------------------------------------------------------------------------
# §2.5 priority queue / top-k (the crawl scheduler)
# ---------------------------------------------------------------------------

def q_frontier_priority(spark, sf_dir):
    """Crawl priority order (process-paths.ts:675-678): global rank by
    (length ASC, created_round ASC, seq ASC), top 100."""
    paths = paths_view(spark, sf_dir)
    # global top-k: orderBy+limit compiles to TakeOrderedAndProject
    # (parallel per-partition top-k + merge); the single-partition
    # ranking window then only ever sees k rows — a bare global window
    # over the full frontier would funnel everything through one task
    top = paths.orderBy("length", "created_round", "seq").limit(100)
    w = Window.orderBy("length", "created_round", "seq")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "head_url", "origin", "length", "created_round", "seq")
    )

SQL_FRONTIER_PRIORITY = f"""
  WITH paths AS ({PATHS_SQL})
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY length, created_round, seq) AS BIGINT) AS rank,
         head_url, origin, length, created_round, seq
  FROM paths
  QUALIFY rank <= 100
"""


def q_per_domain_topk(spark, sf_dir):
    """Per-domain resource budget (Domain.ts:547-565, resourcesPerDomain):
    top 2 heads per origin by priority."""
    paths = paths_view(spark, sf_dir)
    w = Window.partitionBy("origin").orderBy(
        "length", "created_round", "seq")
    return (
        paths.withColumn("dom_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("dom_rank") <= 2)
        .select("origin", "dom_rank", "head_url", "length", "seq")
    )

SQL_PER_DOMAIN_TOPK = f"""
  WITH paths AS ({PATHS_SQL})
  SELECT origin,
         CAST(ROW_NUMBER() OVER (PARTITION BY origin
              ORDER BY length, created_round, seq) AS BIGINT) AS dom_rank,
         head_url, length, seq
  FROM paths
  QUALIFY dom_rank <= 2
"""


def q_politeness_admission(spark, sf_dir):
    """Politeness gate (Domain.ts:326-327 nextAllowed ≤ now): domains
    with simulated next_allowed ≤ round clock 3, joined back to
    schedulable heads."""
    paths = paths_view(spark, sf_dir)
    domains = paths.groupBy("origin").agg(
        (F.min("seq") % 6).cast("int").alias("next_allowed"))
    admitted = domains.filter(F.col("next_allowed") <= 3)
    return (
        paths.join(admitted, "origin")
        .groupBy("origin", "next_allowed")
        .agg(F.count("*").alias("n_heads"))
    )

SQL_POLITENESS_ADMISSION = f"""
  WITH paths AS ({PATHS_SQL}),
  domains AS (
    SELECT origin, CAST(MIN(seq) % 6 AS INT) AS next_allowed
    FROM paths GROUP BY origin
  )
  SELECT p.origin, d.next_allowed, COUNT(*) AS n_heads
  FROM paths p JOIN domains d ON p.origin = d.origin
  WHERE d.next_allowed <= 3
  GROUP BY p.origin, d.next_allowed
"""


def q_additional_resources_topup(spark, sf_dir):
    """Per-domain top-up (Domain.ts:547-565): up to 3 more heads per
    origin that are NOT among the globally-top-50 scheduled ones."""
    paths = paths_view(spark, sf_dir)
    # parallel global top-k (TakeOrderedAndProject), not a full window
    sched = (paths.orderBy("length", "created_round", "seq").limit(50)
             .select("head_url"))
    rest = paths.join(sched, "head_url", "left_anti")
    w = Window.partitionBy("origin").orderBy("length", "created_round", "seq")
    return (
        rest.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("origin", "rk", "head_url")
    )

SQL_ADDITIONAL_TOPUP = f"""
  WITH paths AS ({PATHS_SQL}),
  sched AS (
    SELECT head_url FROM (
      SELECT head_url, ROW_NUMBER() OVER (ORDER BY length, created_round, seq) AS g
      FROM paths) WHERE g <= 50
  ),
  rest AS (
    SELECT p.* FROM paths p
    WHERE NOT EXISTS (SELECT 1 FROM sched s WHERE s.head_url = p.head_url)
  )
  SELECT origin,
         CAST(ROW_NUMBER() OVER (PARTITION BY origin
              ORDER BY length, created_round, seq) AS BIGINT) AS rk,
         head_url
  FROM rest
  QUALIFY rk <= 3
"""


# ---------------------------------------------------------------------------
# §2.3 joins / §2.6 set ops
# ---------------------------------------------------------------------------

def q_seen_set_antijoin(spark, sf_dir):
    """URL-seen dedup (Resource.ts:101-135 unique-index insert →
    LEFT ANTI JOIN): link targets not already in the seen set (first
    half of docs)."""
    p = pages_view(spark, sf_dir)
    l = links_view(spark, sf_dir)
    n = p.count()
    seen = p.filter(F.col("doc_id") < n // 2).select("url")
    return (
        l.select(F.col("dst_url").alias("url")).distinct()
        .join(seen, "url", "left_anti")
        .select("url")
    )

SQL_SEEN_SET_ANTIJOIN = f"""
  WITH pages AS ({PAGES_SQL}), links AS ({LINKS_SQL}),
  seen AS (
    SELECT url FROM pages
    WHERE doc_id < (SELECT COUNT(*) FROM pages) // 2
  )
  SELECT DISTINCT l.dst_url AS url
  FROM links l
  WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.url = l.dst_url)
"""


def q_path_extension_join(spark, sf_dir):
    """The core path-extension equi-join (SURVEY §2.3: frontier heads ⋈
    exploded triple nodes, TraversalPath.ts:762-809) with the cycle and
    self-loop filters (TraversalPath.ts:408-449)."""
    paths = paths_view(spark, sf_dir)
    l = links_view(spark, sf_dir)
    heads = paths.filter(F.col("length") <= 2) \
        .select("head_url", "length", "seq")
    ext = heads.join(l, heads.head_url == l.src_url)
    ext = ext.filter(
        (F.col("dst_url") != F.col("src_url"))       # self-loop
        & (F.col("dst_url") != F.col("head_url"))    # 1-cycle
    )
    return ext.groupBy("head_url", "length").agg(
        F.count("*").alias("n_candidates"),
        F.countDistinct("dst_url").alias("n_new_heads"),
    )

SQL_PATH_EXTENSION_JOIN = f"""
  WITH paths AS ({PATHS_SQL}), links AS ({LINKS_SQL})
  SELECT p.head_url, p.length,
         COUNT(*) AS n_candidates,
         COUNT(DISTINCT l.dst_url) AS n_new_heads
  FROM paths p JOIN links l ON p.head_url = l.src_url
  WHERE p.length <= 2
    AND l.dst_url <> l.src_url
    AND l.dst_url <> p.head_url
  GROUP BY p.head_url, p.length
"""


def q_domains_rollup(spark, sf_dir):
    """Domains-of-process rollup (4-way $lookup chain,
    process-data.ts:313-406) as the TPC-H-style dimension rollup:
    lineitem→orders→customer→nation→region with broadcast dims."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice")
                          * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )

SQL_DOMAINS_ROLLUP = """
  SELECT r.r_name,
         ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
         COUNT(*) AS n_items,
         COUNT(DISTINCT o.o_orderkey) AS n_orders
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name
"""


def q_resource_status_merge(spark, sf_dir):
    """Path-head status refresh (process-paths.ts:1206-1235): left join
    + coalesce('unvisited')."""
    paths = paths_view(spark, sf_dir)
    p = pages_view(spark, sf_dir)
    statuses = p.select(
        "url",
        F.when(F.col("doc_id") % 3 == 0, F.lit("done"))
        .when(F.col("doc_id") % 7 == 0, F.lit("error"))
        .otherwise(F.lit(None).cast("string")).alias("res_status"))
    return (
        paths.join(statuses, paths.head_url == statuses.url, "left")
        .select(
            "head_url",
            F.coalesce("res_status", F.lit("unvisited")).alias("status"))
        .groupBy("status").agg(F.count("*").alias("n"))
    )

SQL_RESOURCE_STATUS_MERGE = f"""
  WITH paths AS ({PATHS_SQL}), pages AS ({PAGES_SQL}),
  statuses AS (
    SELECT url,
           CASE WHEN doc_id % 3 = 0 THEN 'done'
                WHEN doc_id % 7 = 0 THEN 'error' END AS res_status
    FROM pages
  )
  SELECT COALESCE(s.res_status, 'unvisited') AS status, COUNT(*) AS n
  FROM paths p LEFT JOIN statuses s ON p.head_url = s.url
  GROUP BY 1
"""


# ---------------------------------------------------------------------------
# §2.2 filters
# ---------------------------------------------------------------------------

def q_pred_limitations(spark, sf_dir):
    """Predicate allow/deny filter (TraversalPath.ts:554-653 /
    process-utils.ts pattern match): prefix whitelist + substring
    blacklist, label predicates always exempt."""
    l = links_view(spark, sf_dir)
    allowed = F.col("predicate").startswith("http://example.org/pred/")
    denied = F.col("predicate").contains("p3")
    return (
        l.filter(allowed & ~denied)
        .groupBy("predicate").agg(F.count("*").alias("n"))
    )

SQL_PRED_LIMITATIONS = f"""
  WITH links AS ({LINKS_SQL})
  SELECT predicate, COUNT(*) AS n
  FROM links
  WHERE predicate LIKE 'http://example.org/pred/%'
    AND predicate NOT LIKE '%p3%'
  GROUP BY predicate
"""


def q_direction_classify(spark, sf_dir):
    """Direction filter classification (direction-ok.ts:15-33): per
    predicate branch-factor ratio vs neutral zone [0.83, 1.2]."""
    l = links_view(spark, sf_dir)
    bf = l.groupBy("predicate").agg(
        F.countDistinct("src_url").alias("bf_subj"),
        F.countDistinct("dst_url").alias("bf_obj"))
    ratio = F.col("bf_subj").cast("double") / F.col("bf_obj")
    return bf.select(
        "predicate", "bf_subj", "bf_obj",
        F.round(ratio, 6).alias("ratio"),
        F.when(ratio >= 1.2, F.lit("head_must_be_subject"))
        .when(ratio <= 0.83, F.lit("head_must_be_object"))
        .otherwise(F.lit("neutral")).alias("direction"),
    )

SQL_DIRECTION_CLASSIFY = f"""
  WITH links AS ({LINKS_SQL}),
  bf AS (
    SELECT predicate,
           COUNT(DISTINCT src_url) AS bf_subj,
           COUNT(DISTINCT dst_url) AS bf_obj
    FROM links GROUP BY predicate
  )
  SELECT predicate, bf_subj, bf_obj,
         ROUND(CAST(bf_subj AS DOUBLE) / bf_obj, 6) AS ratio,
         CASE WHEN CAST(bf_subj AS DOUBLE) / bf_obj >= 1.2 THEN 'head_must_be_subject'
              WHEN CAST(bf_subj AS DOUBLE) / bf_obj <= 0.83 THEN 'head_must_be_object'
              ELSE 'neutral' END AS direction
  FROM bf
"""


def q_label_language_preference(spark, sf_dir):
    """Label-triple selection (Manager.ts:418-448): per subject prefer
    language='en' labels, else language-less only."""
    p = pages_view(spark, sf_dir)
    labels = p.select(
        F.col("origin").alias("subject"),
        F.col("url").alias("label_value"),
        F.col("lang"))
    has_en = F.max(F.when(F.col("lang") == "en", 1).otherwise(0)) \
        .over(Window.partitionBy("subject"))
    return (
        labels.withColumn("has_en", has_en)
        .filter(
            ((F.col("has_en") == 1) & (F.col("lang") == "en"))
            | ((F.col("has_en") == 0) & (F.col("lang") == ""))
        )
        .groupBy("subject").agg(
            F.count("*").alias("n_labels"),
            F.min("label_value").alias("first_label"))
    )

SQL_LABEL_LANGUAGE_PREFERENCE = f"""
  WITH pages AS ({PAGES_SQL}),
  labels AS (
    SELECT origin AS subject, url AS label_value, lang,
           MAX(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
             OVER (PARTITION BY origin) AS has_en
    FROM pages
  )
  SELECT subject, COUNT(*) AS n_labels, MIN(label_value) AS first_label
  FROM labels
  WHERE (has_en = 1 AND lang = 'en') OR (has_en = 0 AND lang = '')
  GROUP BY subject
"""


def q_blank_node_filter(spark, sf_dir):
    """Blank-node filters (isBlankNodeId + namespacing,
    mongoose-validators + Worker.ts:63-70): classify synthetic node ids
    and namespace the blank ones."""
    p = pages_view(spark, sf_dir)
    nodes = p.select(
        "url",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("_:b"), F.col("doc_id").cast("string")))
        .otherwise(F.col("url")).alias("node"))
    is_blank = F.col("node").startswith("_:") & (F.length("node") > 2)
    return nodes.select(
        "url", "node",
        is_blank.alias("is_blank"),
        F.when(is_blank,
               F.concat(F.lit("_:"), F.col("url"), F.lit(":"),
                        F.substring(F.col("node"), 3, 1000000)))
        .otherwise(F.col("node")).alias("namespaced"),
    )

SQL_BLANK_NODE_FILTER = f"""
  WITH pages AS ({PAGES_SQL}),
  nodes AS (
    SELECT url,
           CASE WHEN doc_id % 5 = 0 THEN '_:b' || CAST(doc_id AS VARCHAR)
                ELSE url END AS node
    FROM pages
  )
  SELECT url, node,
         (node LIKE '\\_:%' ESCAPE '\\' AND LENGTH(node) > 2) AS is_blank,
         CASE WHEN node LIKE '\\_:%' ESCAPE '\\' AND LENGTH(node) > 2
              THEN '_:' || url || ':' || SUBSTR(node, 3)
              ELSE node END AS namespaced
  FROM nodes
"""


# ---------------------------------------------------------------------------
# §2.4 aggregations / metrics
# ---------------------------------------------------------------------------

def q_head_group_min_distance(spark, sf_dir):
    """Head-group min distance (process-paths.ts:101-144):
    shortestPathLength = min length per head."""
    paths = paths_view(spark, sf_dir)
    return paths.groupBy("head_url").agg(
        F.min("length").alias("shortest_path_length"),
        F.count("*").alias("n_paths"))

SQL_HEAD_GROUP_MIN = f"""
  WITH paths AS ({PATHS_SQL})
  SELECT head_url, MIN(length) AS shortest_path_length,
         COUNT(*) AS n_paths
  FROM paths GROUP BY head_url
"""


def q_branching_factor(spark, sf_dir):
    """Branching factor (process-metrics.ts:122-145): distinct subjects
    and objects per predicate."""
    l = links_view(spark, sf_dir)
    return l.groupBy("predicate").agg(
        F.countDistinct("src_url").alias("n_subjects"),
        F.countDistinct("dst_url").alias("n_objects"),
        F.count("*").alias("n_triples"))

SQL_BRANCHING_FACTOR = f"""
  WITH links AS ({LINKS_SQL})
  SELECT predicate,
         COUNT(DISTINCT src_url) AS n_subjects,
         COUNT(DISTINCT dst_url) AS n_objects,
         COUNT(*) AS n_triples
  FROM links GROUP BY predicate
"""


def q_global_metrics(spark, sf_dir):
    """Global process metrics (process-metrics.ts:147-202): totals +
    distinct subjects/objects/nodes (union of both ends)."""
    l = links_view(spark, sf_dir)
    nodes = l.select(F.col("src_url").alias("node")).unionByName(
        l.select(F.col("dst_url").alias("node")))
    a = l.agg(
        F.count("*").alias("n_triples"),
        F.countDistinct("src_url").alias("n_subjects"),
        F.countDistinct("dst_url").alias("n_objects"))
    b = nodes.agg(F.countDistinct("node").alias("n_nodes"))
    return a.crossJoin(b)

SQL_GLOBAL_METRICS = f"""
  WITH links AS ({LINKS_SQL}),
  nodes AS (
    SELECT src_url AS node FROM links
    UNION ALL SELECT dst_url FROM links
  )
  SELECT (SELECT COUNT(*) FROM links) AS n_triples,
         (SELECT COUNT(DISTINCT src_url) FROM links) AS n_subjects,
         (SELECT COUNT(DISTINCT dst_url) FROM links) AS n_objects,
         (SELECT COUNT(DISTINCT node) FROM nodes) AS n_nodes
"""


def q_avg_path_metrics(spark, sf_dir):
    """Avg path length (process-data.ts:434-462)."""
    paths = paths_view(spark, sf_dir)
    return paths.agg(
        F.round(F.avg("length"), 6).alias("avg_length"),
        F.count("*").alias("n_paths"),
        F.max("length").alias("max_length"))

SQL_AVG_PATH_METRICS = f"""
  WITH paths AS ({PATHS_SQL})
  SELECT ROUND(AVG(length), 6) AS avg_length,
         COUNT(*) AS n_paths, MAX(length) AS max_length
  FROM paths
"""


def q_crawl_rate_window(spark, sf_dir):
    """Crawl rate (process-data.ts:587-599): events in the trailing
    5-minute window before the max timestamp, per event type."""
    e = load(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("mx"))
    return (
        e.crossJoin(mx)
        .filter(F.col("ts") >= F.col("mx") - F.expr("INTERVAL 5 MINUTES"))
        .groupBy("event_type").agg(F.count("*").alias("n_recent"))
    )

SQL_CRAWL_RATE_WINDOW = """
  SELECT event_type, COUNT(*) AS n_recent
  FROM events
  WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 5 MINUTE
  GROUP BY event_type
"""


def q_domain_queue_counters(spark, sf_dir):
    """Domain crawl counters (Domain.ts:239-258 $inc queued/success):
    per-origin queued/done/error tallies."""
    p = pages_view(spark, sf_dir)
    status = F.when(F.col("doc_id") % 3 == 0, "done") \
        .when(F.col("doc_id") % 7 == 0, "error").otherwise("queued")
    return (
        p.withColumn("status", status)
        .groupBy("origin")
        .agg(
            F.sum(F.when(F.col("status") == "queued", 1).otherwise(0))
            .alias("queued"),
            F.sum(F.when(F.col("status") == "done", 1).otherwise(0))
            .alias("success"),
            F.sum(F.when(F.col("status") == "error", 1).otherwise(0))
            .alias("failed"),
        )
    )

SQL_DOMAIN_QUEUE_COUNTERS = f"""
  WITH pages AS ({PAGES_SQL}),
  st AS (
    SELECT origin,
           CASE WHEN doc_id % 3 = 0 THEN 'done'
                WHEN doc_id % 7 = 0 THEN 'error'
                ELSE 'queued' END AS status
    FROM pages
  )
  SELECT origin,
         CAST(SUM(CASE WHEN status = 'queued' THEN 1 ELSE 0 END) AS BIGINT) AS queued,
         CAST(SUM(CASE WHEN status = 'done' THEN 1 ELSE 0 END) AS BIGINT) AS success,
         CAST(SUM(CASE WHEN status = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS failed
  FROM st GROUP BY origin
"""


def q_next_allowed_calc(spark, sf_dir):
    """nextAllowed = endTime + delay (Domain.ts:201-210,949-972):
    timestamp arithmetic per event."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id", "ts",
        (F.col("ts") + F.expr("INTERVAL 90 SECONDS")).alias("next_allowed"),
    )

SQL_NEXT_ALLOWED_CALC = """
  SELECT event_id, ts, ts + INTERVAL 90 SECOND AS next_allowed
  FROM events
"""


# ---------------------------------------------------------------------------
# §2.3 existing-endpoint merge + §2.4/§2.5 remaining rows
# ---------------------------------------------------------------------------

def q_endpoint_merge(spark, sf_dir):
    """Existing-endpoint merge (EndpointPath.ts:490-608,
    process-paths.ts:1000-1168): candidate heads FULL OUTER JOIN the
    existing endpoint table on (head_url, seed); per-seed min length
    via least(), shortest_path_length per head — the deterministic
    groupBy/join replacement for the reference's optimistic-lock retry
    loops."""
    paths = paths_view(spark, sf_dir)
    seed_col = F.concat(F.lit("https://seed"),
                        (F.col("seq") % 5).cast("string"),
                        F.lit(".example.org"))
    exist = paths.filter(F.col("seq") % 2 == 0).select(
        "head_url", seed_col.alias("seed"),
        F.col("length").alias("e_len"))
    cand = paths.filter(F.col("seq") % 3 == 0).select(
        "head_url", seed_col.alias("seed"),
        (F.col("length") + 1).alias("c_len"))
    merged = (
        exist.join(cand, ["head_url", "seed"], "full_outer")
        .select(
            "head_url", "seed",
            F.least(F.coalesce("e_len", "c_len"),
                    F.coalesce("c_len", "e_len")).alias("min_length"))
    )
    w = Window.partitionBy("head_url")
    return merged.withColumn(
        "shortest_path_length", F.min("min_length").over(w))

SQL_ENDPOINT_MERGE = f"""
  WITH paths AS ({PATHS_SQL}),
  exist AS (
    SELECT head_url,
           'https://seed' || CAST(seq % 5 AS VARCHAR) || '.example.org' AS seed,
           length AS e_len
    FROM paths WHERE seq % 2 = 0
  ),
  cand AS (
    SELECT head_url,
           'https://seed' || CAST(seq % 5 AS VARCHAR) || '.example.org' AS seed,
           length + 1 AS c_len
    FROM paths WHERE seq % 3 = 0
  ),
  merged AS (
    SELECT COALESCE(e.head_url, c.head_url) AS head_url,
           COALESCE(e.seed, c.seed) AS seed,
           LEAST(COALESCE(e.e_len, c.c_len), COALESCE(c.c_len, e.e_len))
             AS min_length
    FROM exist e FULL OUTER JOIN cand c
      ON e.head_url = c.head_url AND e.seed = c.seed
  )
  SELECT head_url, seed, min_length,
         MIN(min_length) OVER (PARTITION BY head_url)
           AS shortest_path_length
  FROM merged
"""


def q_label_fetch_batching(spark, sf_dir):
    """Label-fetch batching (Domain.ts:610-731): paginate pending
    resource labels by creation order, group per domain into batches of
    resLimit=20 — row_number window over hash(origin) partitions."""
    p = pages_view(spark, sf_dir)
    labels = p.filter(F.col("doc_id") % 2 == 0)
    w = Window.partitionBy("origin").orderBy("doc_id")
    batched = labels.withColumn(
        "batch_id", ((F.row_number().over(w) - 1) / 20).cast("int"))
    return batched.groupBy("origin", "batch_id").agg(
        F.count("*").alias("n_urls"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"))

SQL_LABEL_FETCH_BATCHING = f"""
  WITH pages AS ({PAGES_SQL}),
  labels AS (SELECT * FROM pages WHERE doc_id % 2 = 0),
  batched AS (
    SELECT origin, doc_id,
           CAST((ROW_NUMBER() OVER (PARTITION BY origin ORDER BY doc_id)
                 - 1) // 20 AS INT) AS batch_id
    FROM labels
  )
  SELECT origin, batch_id, COUNT(*) AS n_urls,
         MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
  FROM batched GROUP BY origin, batch_id
"""


def q_label_upsert(spark, sf_dir):
    """ResourceLabel.upsertMany MERGE (ResourceLabel.ts:45-128) over a
    derived label substrate: dedup-last incoming by (pid, url), insert
    unseen as 'new', preserve 'done', upgrade source web→cardea and
    extend false→true on 'new'/'error' rows. Exercises all branches:
    inserts (odd doc_ids %3==0), preserves, and both upgrades."""
    from derzis_spark.operators.label_fetch import upsert_labels

    p = pages_view(spark, sf_dir)
    d = F.col("doc_id")
    labels = p.filter(d % 2 == 0).select(
        F.lit("p1").alias("pid"), "url",
        F.col("origin").alias("domain"),
        F.when(d % 4 == 0, F.lit("web")).otherwise(F.lit("cardea"))
         .alias("source"),
        (d % 8 < 4).alias("extend"),
        F.when(d % 6 == 0, F.lit("done"))
         .when(d % 6 == 2, F.lit("new")).otherwise(F.lit("error"))
         .alias("status"),
    )
    base = p.filter(d % 3 == 0)
    inc0 = base.select(
        F.lit("p1").alias("pid"), "url",
        F.col("origin").alias("domain"),
        F.lit("web").alias("source"), F.lit(False).alias("extend"),
        (d * 2).alias("arrival_seq"))
    inc1 = base.select(
        F.lit("p1").alias("pid"), "url",
        F.col("origin").alias("domain"),
        F.when(d % 2 == 0, F.lit("cardea")).otherwise(F.lit("web"))
         .alias("source"),
        (d % 5 < 3).alias("extend"),
        (d * 2 + 1).alias("arrival_seq"))
    return upsert_labels(labels, inc0.unionByName(inc1))

SQL_LABEL_UPSERT = f"""
  WITH pages AS ({PAGES_SQL}),
  labels AS (
    SELECT 'p1' AS pid, url, origin AS domain,
           CASE WHEN doc_id % 4 = 0 THEN 'web' ELSE 'cardea' END AS source,
           doc_id % 8 < 4 AS extend,
           CASE WHEN doc_id % 6 = 0 THEN 'done'
                WHEN doc_id % 6 = 2 THEN 'new' ELSE 'error' END AS status
    FROM pages WHERE doc_id % 2 = 0
  ),
  incoming_raw AS (
    SELECT 'p1' AS pid, url, origin AS domain, 'web' AS source,
           FALSE AS extend, doc_id * 2 AS arrival_seq
    FROM pages WHERE doc_id % 3 = 0
    UNION ALL
    SELECT 'p1', url, origin,
           CASE WHEN doc_id % 2 = 0 THEN 'cardea' ELSE 'web' END,
           doc_id % 5 < 3, doc_id * 2 + 1
    FROM pages WHERE doc_id % 3 = 0
  ),
  inc AS (
    SELECT pid, url,
           max_by(domain, arrival_seq) AS i_domain,
           max_by(source, arrival_seq) AS i_source,
           max_by(extend, arrival_seq) AS i_extend
    FROM incoming_raw GROUP BY pid, url
  )
  SELECT COALESCE(l.pid, i.pid) AS pid,
         COALESCE(l.url, i.url) AS url,
         CASE WHEN l.status IS NULL THEN i.i_domain
              WHEN l.status = 'done' OR i.i_source IS NULL THEN l.domain
              ELSE i.i_domain END AS domain,
         CASE WHEN l.status IS NULL THEN i.i_source
              WHEN l.status = 'done' OR i.i_source IS NULL THEN l.source
              WHEN l.source = 'web' AND i.i_source = 'cardea'
                THEN 'cardea'
              ELSE l.source END AS source,
         CASE WHEN l.status IS NULL THEN i.i_extend
              WHEN l.status = 'done' OR i.i_source IS NULL THEN l.extend
              ELSE l.extend OR i.i_extend END AS extend,
         CASE WHEN l.status IS NULL THEN 'new' ELSE l.status END AS status
  FROM labels l FULL OUTER JOIN inc i
    ON l.pid = i.pid AND l.url = i.url
"""


def q_seed_coverage(spark, sf_dir):
    """Seed coverage (process-metrics.ts:88-120): distinct seed URLs
    appearing as subject/object per predicate."""
    l = links_view(spark, sf_dir)
    return l.groupBy("predicate").agg(
        F.countDistinct(F.when(F.col("src_doc") % 10 == 0,
                               F.col("src_url"))).alias("subj_seed_cov"),
        F.countDistinct(F.when(F.col("dst_doc") % 10 == 0,
                               F.col("dst_url"))).alias("obj_seed_cov"))

SQL_SEED_COVERAGE = f"""
  WITH links AS ({LINKS_SQL})
  SELECT predicate,
         COUNT(DISTINCT CASE WHEN src_doc % 10 = 0 THEN src_url END)
           AS subj_seed_cov,
         COUNT(DISTINCT CASE WHEN dst_doc % 10 = 0 THEN dst_url END)
           AS obj_seed_cov
  FROM links GROUP BY predicate
"""


def q_triple_dedup_upsert(spark, sf_dir):
    """Triple sink per-key dedup with source-set union
    (Triple.ts:79-232, $addToSet sources → distinct aggregation):
    grouped by (predicate, object), sources summarized stably."""
    l = links_view(spark, sf_dir)
    return l.groupBy("predicate", F.col("dst_url").alias("object_url")).agg(
        F.countDistinct("src_url").alias("n_sources"),
        F.min("src_url").alias("first_source"),
        F.max("src_url").alias("last_source"))

SQL_TRIPLE_DEDUP_UPSERT = f"""
  WITH links AS ({LINKS_SQL})
  SELECT predicate, dst_url AS object_url,
         COUNT(DISTINCT src_url) AS n_sources,
         MIN(src_url) AS first_source,
         MAX(src_url) AS last_source
  FROM links GROUP BY predicate, dst_url
"""


def q_alternate_redirects(spark, sf_dir):
    """Alternate-URL redirect resolution (Worker.ts:744-766,
    worker-utils.ts:122-160): wrong-MIME pages chase their RDF
    alternate link up to 5 hops. Derived substrate: doc d is HTML-only
    iff d % 7 == 3 and its alternate target is (d*5+2) % N; chains are
    resolved with one equi-join per hop level (exactly the engine's
    batched hop resolution, engine._resolve_alternates), terminal
    statuses done / error:too_many_redirects."""
    from functools import reduce

    p = pages_view(spark, sf_dir)
    n = p.count()
    nodes = p.select(
        F.col("doc_id").alias("node"),
        F.col("url").alias("node_url"),
        ((F.col("doc_id") % 7) == 3).alias("is_html"),
        ((F.col("doc_id") * 5 + 2) % F.lit(n)).alias("alt"),
    )
    state = nodes.filter("is_html").select(
        F.col("node_url").alias("src_url"), F.col("alt").alias("cur"))
    done_parts = []
    for hop in range(1, 6):
        st = state.join(
            nodes.select(F.col("node").alias("cur"),
                         "node_url", "is_html", "alt"),
            "cur")
        done_parts.append(
            st.filter(~F.col("is_html")).select(
                "src_url",
                F.col("node_url").alias("final_url"),
                F.lit(hop).cast("int").alias("hops"),
                F.lit("done").alias("status")))
        state = st.filter("is_html").select(
            "src_url", F.col("alt").alias("cur"))
    toomany = state.select(
        "src_url",
        F.lit(None).cast("string").alias("final_url"),
        F.lit(5).cast("int").alias("hops"),
        F.lit("error:too_many_redirects").alias("status"))
    return reduce(DataFrame.unionByName, done_parts).unionByName(toomany)

SQL_ALTERNATE_REDIRECTS = f"""
  WITH RECURSIVE pages AS ({PAGES_SQL}),
  nodes AS (
    SELECT doc_id AS node, url AS node_url,
           (doc_id % 7) = 3 AS is_html,
           (doc_id * 5 + 2) % (SELECT COUNT(*) FROM pages) AS alt
    FROM pages
  ),
  chase(src_url, cur, fetched) AS (
    SELECT node_url, alt, 0 FROM nodes WHERE is_html
    UNION ALL
    SELECT c.src_url, n.alt, c.fetched + 1
    FROM chase c JOIN nodes n ON n.node = c.cur
    WHERE n.is_html AND c.fetched + 1 < 5
  )
  SELECT c.src_url, n.node_url AS final_url,
         CAST(c.fetched + 1 AS INT) AS hops, 'done' AS status
  FROM chase c JOIN nodes n ON n.node = c.cur
  WHERE NOT n.is_html
  UNION ALL
  SELECT c.src_url, NULL AS final_url, CAST(5 AS INT) AS hops,
         'error:too_many_redirects' AS status
  FROM chase c JOIN nodes n ON n.node = c.cur
  WHERE n.is_html AND c.fetched = 4
"""


# ---------------------------------------------------------------------------
# §2.1 export sinks + progress/diagnostic queries (round-3 additions)
# ---------------------------------------------------------------------------

RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDFS_COMMENT = "http://www.w3.org/2000/01/rdf-schema#comment"


def q_json_export(spark, sf_dir):
    """JSON export sinks — getTriplesJson / getDomainsJson /
    getResourcesJson (models/src/Process/process-data.ts:143-166) as ONE
    distributed projection: a (kind, json) line per triple, domain and
    resource, in the reference's JSON.stringify shape (named-node
    triples carry the object inline, literal triples carry
    {value, language}; domains/resources serialize to a bare quoted
    string). Pure JVM concat exprs — the substrate's values are
    JSON-safe by construction; a free-text corpus would swap the concat
    for ``to_json(struct(...))`` + an escaping expression."""
    l = links_view(spark, sf_dir)
    p = pages_view(spark, sf_dir)
    named = l.select(
        F.lit("triple").alias("kind"),
        F.concat(
            F.lit('{"subject":"'), F.col("src_url"),
            F.lit('","predicate":"'), F.col("predicate"),
            F.lit('","object":"'), F.col("dst_url"),
            F.lit('","type":"namedNode"}')).alias("json"))
    lits = p.filter(F.col("lang") != "").select(
        F.lit("triple").alias("kind"),
        F.concat(
            F.lit('{"subject":"'), F.col("url"),
            F.lit('","predicate":"' + RDFS_LABEL
                  + '","object":{"value":"doc-'),
            F.col("doc_id").cast("string"),
            F.lit('","language":"'), F.col("lang"),
            F.lit('"},"type":"literal"}')).alias("json"))
    domains = p.select("origin").distinct().select(
        F.lit("domain").alias("kind"),
        F.concat(F.lit('"'), F.col("origin"), F.lit('"')).alias("json"))
    resources = p.select(
        F.lit("resource").alias("kind"),
        F.concat(F.lit('"'), F.col("url"), F.lit('"')).alias("json"))
    return (named.unionByName(lits).unionByName(domains)
            .unionByName(resources))

SQL_JSON_EXPORT = f"""
  WITH pages AS ({PAGES_SQL}), links AS ({LINKS_SQL})
  SELECT 'triple' AS kind,
         '{{"subject":"' || src_url || '","predicate":"' || predicate
           || '","object":"' || dst_url || '","type":"namedNode"}}' AS json
  FROM links
  UNION ALL
  SELECT 'triple' AS kind,
         '{{"subject":"' || url
           || '","predicate":"{RDFS_LABEL}","object":{{"value":"doc-'
           || CAST(doc_id AS VARCHAR) || '","language":"' || lang
           || '"}},"type":"literal"}}' AS json
  FROM pages WHERE lang <> ''
  UNION ALL
  SELECT 'domain' AS kind, '"' || origin || '"' AS json
  FROM (SELECT DISTINCT origin FROM pages)
  UNION ALL
  SELECT 'resource' AS kind, '"' || url || '"' AS json FROM pages
"""


def q_path_progress(spark, sf_dir):
    """getPathProgress (process-data.ts:565-585, reference test
    process-progress.test.ts:35-111): remaining work = active paths
    matching the current step constraints (length under the step's
    maxPathLength) whose head resource is still unvisited; crawling and
    checking are structurally 0 in the round-synchronous model (no
    in-flight jobs between rounds). Reported per pathLength — the
    reference's totals are the column sums — so operators can see WHERE
    the remaining frontier sits. One groupBy, map-side combinable."""
    max_len = 3  # step constraint (maxPathLength analog)
    paths = paths_view(spark, sf_dir)
    p = pages_view(spark, sf_dir)
    statuses = p.select(
        "url",
        F.when(F.col("doc_id") % 3 == 0, F.lit("done"))
        .when(F.col("doc_id") % 7 == 0, F.lit("error"))
        .otherwise(F.lit(None).cast("string")).alias("res_status"))
    return (
        paths.join(statuses, paths.head_url == statuses.url, "left")
        .withColumn("status",
                    F.coalesce("res_status", F.lit("unvisited")))
        .filter(F.col("length") < max_len)
        .groupBy("length").agg(
            F.sum(F.when(F.col("status") == "unvisited", 1).otherwise(0))
            .cast("bigint").alias("unvisited"),
            F.lit(0).cast("bigint").alias("crawling"),
            F.lit(0).cast("bigint").alias("checking"))
    )

SQL_PATH_PROGRESS = f"""
  WITH pages AS ({PAGES_SQL}), paths AS ({PATHS_SQL}),
  statuses AS (
    SELECT url, CASE WHEN doc_id % 3 = 0 THEN 'done'
                     WHEN doc_id % 7 = 0 THEN 'error' END AS res_status
    FROM pages
  )
  SELECT p.length,
         CAST(SUM(CASE WHEN COALESCE(s.res_status, 'unvisited')
                            = 'unvisited' THEN 1 ELSE 0 END) AS BIGINT)
           AS unvisited,
         CAST(0 AS BIGINT) AS crawling,
         CAST(0 AS BIGINT) AS checking
  FROM paths p LEFT JOIN statuses s ON p.head_url = s.url
  WHERE p.length < 3
  GROUP BY p.length
"""


def q_label_data_lookup(spark, sf_dir):
    """getLabelDataForUrls (process-data.ts:29-77): given a URL set,
    fetch its rdfs:label / rdfs:comment literal triples and group them
    by subject, returning only URLs that HAVE label data. The label
    store is dimension-thin next to the triple store, so the lookup is
    a broadcast-friendly equi-join; values are aggregated into one
    sorted string per URL so the result hashes deterministically."""
    p = pages_view(spark, sf_dir)
    urls = p.filter(F.col("doc_id") % 6 == 0).select("url")
    labels = p.filter(F.col("lang") != "").select(
        "url", F.lit(RDFS_LABEL).alias("predicate"),
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string"))
        .alias("value"), F.col("lang"))
    comments = p.filter(F.col("doc_id") % 3 == 0).select(
        "url", F.lit(RDFS_COMMENT).alias("predicate"),
        F.concat(F.lit("about doc "), F.col("doc_id").cast("string"))
        .alias("value"), F.lit("en").alias("lang"))
    trip = labels.unionByName(comments)
    return (
        urls.join(trip, "url")
        .groupBy("url").agg(
            F.count("*").cast("bigint").alias("n_triples"),
            F.array_join(F.sort_array(F.collect_list(F.concat_ws(
                "|", "predicate", "value", "lang"))), ";")
            .alias("triples"))
    )

SQL_LABEL_DATA_LOOKUP = f"""
  WITH pages AS ({PAGES_SQL}),
  trip AS (
    SELECT url, '{RDFS_LABEL}' AS predicate,
           'doc-' || CAST(doc_id AS VARCHAR) AS value, lang
    FROM pages WHERE lang <> ''
    UNION ALL
    SELECT url, '{RDFS_COMMENT}' AS predicate,
           'about doc ' || CAST(doc_id AS VARCHAR) AS value, 'en' AS lang
    FROM pages WHERE doc_id % 3 = 0
  )
  SELECT u.url, CAST(COUNT(*) AS BIGINT) AS n_triples,
         string_agg(t.predicate || '|' || t.value || '|' || t.lang, ';'
                    ORDER BY t.predicate || '|' || t.value || '|' || t.lang)
           AS triples
  FROM (SELECT url FROM pages WHERE doc_id % 6 = 0) u
  JOIN trip t ON t.url = u.url
  GROUP BY u.url
"""


#: seed-graph BFS: selected predicates and hop budget
#: (manager/src/lib/seed-graph-utils.ts:31-93)
SEED_GRAPH_PREDS = tuple(
    f"http://example.org/pred/p{i}" for i in (0, 1, 2))
SEED_GRAPH_MAX_HOPS = 3


def q_seed_graph_edges(spark, sf_dir):
    """Seed-graph edge aggregation (seed-graph-utils.ts:1-155):
    BFS min-hop distances from the seed set over the selected
    predicates — each expansion direction gated by the predicate's
    branch factor exactly as ``directionOk`` (subject→object needs
    ratio ≥ 0.83, object→subject needs ratio ≤ 1.2) — then keep the
    triples whose endpoints sit at CONSECUTIVE hop levels
    (filterTriplesByConsecutiveHops). Level-synchronous distributed
    BFS: ``maxHops`` rounds of join + anti-join against the visited
    set — identical min-hop map to the reference's queue BFS, with no
    driver-side frontier."""
    l = links_view(spark, sf_dir).select(
        "src_url", "dst_url", "predicate").distinct()
    sel = list(SEED_GRAPH_PREDS)
    bf = (l.filter(F.col("predicate").isin(sel))
          .groupBy("predicate").agg(
              (F.countDistinct("src_url").cast("double")
               / F.countDistinct("dst_url")).alias("ratio")))
    edges = (l.join(F.broadcast(bf), "predicate")
             .select("src_url", "dst_url", "predicate", "ratio")
             .localCheckpoint(eager=True))
    p = pages_view(spark, sf_dir)
    seeds = p.filter(F.col("doc_id") % 97 == 0).select("url")
    hops = seeds.withColumn("hop", F.lit(0))
    frontier = seeds
    for k in range(1, SEED_GRAPH_MAX_HOPS + 1):
        fwd = (frontier.join(edges, frontier.url == edges.src_url)
               .filter(F.col("ratio") >= 0.83)
               .select(F.col("dst_url").alias("url")))
        bwd = (frontier.join(edges, frontier.url == edges.dst_url)
               .filter(F.col("ratio") <= 1.2)
               .select(F.col("src_url").alias("url")))
        nxt = (fwd.unionByName(bwd).distinct()
               .join(hops.select("url"), "url", "left_anti")
               .withColumn("hop", F.lit(k))
               .localCheckpoint(eager=True))
        hops = hops.unionByName(nxt)
        frontier = nxt.select("url")
    hs = hops.select(F.col("url").alias("src_url"),
                     F.col("hop").alias("subject_hop"))
    ho = hops.select(F.col("url").alias("dst_url"),
                     F.col("hop").alias("object_hop"))
    return (
        l.join(hs, "src_url").join(ho, "dst_url")
        .filter(F.abs(F.col("subject_hop") - F.col("object_hop")) == 1)
        .select(F.col("src_url").alias("subject"), "predicate",
                F.col("dst_url").alias("object"),
                F.col("subject_hop").cast("int").alias("subject_hop"),
                F.col("object_hop").cast("int").alias("object_hop"))
    )

SQL_SEED_GRAPH_EDGES = f"""
  WITH RECURSIVE pages AS ({PAGES_SQL}), links AS ({LINKS_SQL}),
  l AS (SELECT DISTINCT src_url, dst_url, predicate FROM links),
  bf AS (
    SELECT predicate,
           CAST(COUNT(DISTINCT src_url) AS DOUBLE)
             / COUNT(DISTINCT dst_url) AS ratio
    FROM l
    WHERE predicate IN ({", ".join(repr(s) for s in SEED_GRAPH_PREDS)})
    GROUP BY predicate
  ),
  edges AS (
    SELECT x.src_url, x.dst_url, x.predicate, b.ratio
    FROM l x JOIN bf b ON b.predicate = x.predicate
  ),
  walk(url, hop) AS (
    SELECT url, 0 FROM pages WHERE doc_id % 97 = 0
    UNION
    SELECT CASE WHEN e.src_url = w.url THEN e.dst_url
                ELSE e.src_url END, w.hop + 1
    FROM walk w JOIN edges e
      ON (e.src_url = w.url AND e.ratio >= 0.83)
      OR (e.dst_url = w.url AND e.ratio <= 1.2)
    WHERE w.hop < {SEED_GRAPH_MAX_HOPS}
  ),
  hops AS (SELECT url, MIN(hop) AS hop FROM walk GROUP BY url)
  SELECT x.src_url AS subject, x.predicate, x.dst_url AS object,
         CAST(hs.hop AS INT) AS subject_hop,
         CAST(ho.hop AS INT) AS object_hop
  FROM l x
  JOIN hops hs ON hs.url = x.src_url
  JOIN hops ho ON ho.url = x.dst_url
  WHERE ABS(hs.hop - ho.hop) = 1
"""
