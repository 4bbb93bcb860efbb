"""Spark schemas for the engine's state and input tables.

Mapping from the reference's MongoDB collections (SURVEY.md §1.2):
``resources`` (URL-seen set, models/src/Resource.ts:70-99), ``domains``
(politeness + robots cache, models/src/Domain.ts:117-150), ``paths``
(frontier, models/src/Path/TraversalPath.ts:179-197), ``triples``
(models/src/Triple/Triple.ts:57-77). Discriminated unions become a tag
column; ObjectId ordering becomes the stored deterministic ``seq``.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

ROBOTS = StructType([
    StructField("origin", StringType(), False),
    StructField("status", StringType(), False),
    StructField("robots_txt", StringType(), True),
])

SEEDS = StructType([StructField("url", StringType(), False)])

RESOURCES = StructType([
    StructField("url", StringType(), False),
    StructField("origin", StringType(), True),
    StructField("status", StringType(), False),  # unvisited|done|error
    # crawlId (Resource.ts:35-41): domainTs ≡ round of the last crawl
    # attempt; counter = per-domain-crawl sequence (Worker.ts:395-413)
    StructField("crawl_round", IntegerType(), True),
    StructField("crawl_counter", IntegerType(), True),
])

DOMAINS = StructType([
    StructField("origin", StringType(), False),
    StructField("status", StringType(), False),  # unvisited|ready|error
    StructField("robots_status", StringType(), True),
    StructField("robots_txt", StringType(), True),
    StructField("crawl_delay", IntegerType(), False),
    StructField("next_allowed", IntegerType(), False),
    # warning counters + last-10 ring (Domain.ts:45-58,44; incremented
    # per Resource.ts:232-266 / Domain.ts:1026-1049)
    StructField("warnings", MapType(StringType(), IntegerType()), False),
    StructField("last_warnings", ArrayType(StringType()), False),
])

PATHS = StructType([
    StructField("seed", StringType(), False),
    StructField("head_url", StringType(), True),   # null for literal heads
    StructField("head_kind", StringType(), False),  # url|literal|blank
    StructField("head_key", StringType(), False),
    StructField("nodes", ArrayType(StringType()), False),
    StructField("predicates", ArrayType(StringType()), False),
    # traversal: non-blank node count; endpoint: shortestPathLength
    StructField("length", IntegerType(), False),
    StructField("status", StringType(), False),    # active|deleted
    StructField("created_round", IntegerType(), False),
    StructField("seq", LongType(), False),
    # endpoint paths only (EndpointPath.ts:128-140): seed -> min length
    StructField("seed_paths", MapType(StringType(), IntegerType()), True),
])

TRIPLES = StructType([
    StructField("subject", StringType(), False),
    StructField("predicate", StringType(), False),
    StructField("object_kind", StringType(), False),  # uri|literal|blank
    StructField("object_value", StringType(), False),
    StructField("object_datatype", StringType(), True),
    StructField("object_language", StringType(), True),
    StructField("sources", ArrayType(StringType()), False),
])

TRACE = StructType([
    StructField("round", IntegerType(), False),
    StructField("seq", IntegerType(), False),
    StructField("url", StringType(), False),
    StructField("origin", StringType(), False),
    StructField("status", StringType(), False),
])

RAW_TRIPLE = StructType([
    StructField("subject", StringType(), False),
    StructField("predicate", StringType(), False),
    StructField("object_kind", StringType(), False),
    StructField("object_value", StringType(), False),
    StructField("object_datatype", StringType(), True),
    StructField("object_language", StringType(), True),
])
