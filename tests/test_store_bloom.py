"""Store-side Bloom pre-passes (round-4 ingest optimization): the
triple-key filter that gates the MERGE collision scan and the
source-URL filter that gates the fetch-phase triple-cache probe. Both
must be semantically invisible — false positives fall through to the
exact store joins, false negatives are impossible — so a crawl with
them on must match the oracle (and the no-bloom engine) bit-for-bit.
Reference semantics: Triple.ts:79-232 (MERGE/upsert), Worker.ts:340-379
(cache fetch-skip)."""

import pyspark.sql.functions as F
import pytest

from derzis_spark.config import CrawlConfig
from derzis_spark.engine import TRIPLE_KEY, CrawlEngine
from derzis_spark.fixtures import generate_fixture
from derzis_spark.operators.seen_set import BloomFilter
from derzis_spark.oracle import run_oracle_on_fixture
from tests.conftest import fixture_dataframes
from tests.test_engine_matches_oracle import assert_match, run_both


def test_multicol_bloom_no_false_negatives(spark):
    """Multi-column keys (the triple MERGE key, nulls included) probe
    positive for every built key."""
    rows = [
        ("s1", "p1", "uri", "o1", None, None),
        ("s1", "p1", "literal", "o1", "dt", None),
        ("s1", "p1", "literal", "o1", None, "en"),
        ("s1", "p1", "literal", "", "", ""),
        ("s2", "p2", "uri", "s2", None, None),
    ]
    schema = ("subject string, predicate string, object_kind string, "
              "object_value string, object_datatype string, "
              "object_language string")
    df = spark.createDataFrame(rows, schema)
    bf = BloomFilter.build(spark, df, *TRIPLE_KEY, capacity=10_000)
    got = df.withColumn("m", bf.might_contain(*TRIPLE_KEY)).collect()
    assert all(r["m"] for r in got)
    # and a disjoint key space is (overwhelmingly) negative
    other = spark.createDataFrame(
        [(f"x{i}", "q", "uri", f"y{i}", None, None) for i in range(200)],
        schema)
    miss = other.withColumn("m", bf.might_contain(*TRIPLE_KEY)).collect()
    assert sum(r["m"] for r in miss) <= 5  # ~fpp, not all-positive


def test_crawl_matches_oracle_with_and_without_store_blooms(spark):
    """Same fixture, bloom on vs off: both bit-exact vs the oracle —
    the pre-passes change plans, never results. The fixture re-extracts
    shared triples across pages, so the collision path (maybe-coll > 0)
    and the pure-append path both execute."""
    fx = generate_fixture(seed=1106, n_pages=60, n_origins=6, n_seeds=3)
    cfg_on = CrawlConfig(max_path_length=3, use_bloom=True,
                         bloom_capacity=10_000)
    cfg_off = CrawlConfig(max_path_length=3, use_bloom=False)
    oracle, eng_on = run_both(spark, fx, cfg_on)
    assert_match(oracle, eng_on)
    _, eng_off = run_both(spark, fx, cfg_off)
    assert_match(oracle, eng_off)
    # the bloom engine actually took the pre-pass (profile recorded it)
    assert any("n_maybe_coll" in m.get("ingest_detail", {})
               for m in eng_on.metrics)


def test_cache_probe_skips_store_scan_when_no_source_rescheduled(spark):
    """A fresh crawl whose schedule never re-visits a triple source
    must keep the fetch-phase cache probe on the bloom fast path; a
    forced re-schedule of a known source still produces cache hits
    (exactness through the pre-pass)."""
    fx = generate_fixture(seed=7, n_pages=40, n_origins=4, n_seeds=2)
    cfg = CrawlConfig(max_path_length=3, bloom_capacity=10_000)
    pages, robots, seeds = fixture_dataframes(spark, fx)
    engine = CrawlEngine(spark, pages, robots, cfg)
    engine.run(seeds, max_rounds=3)
    assert engine._source_bloom is not None
    # every URL in any source set must probe positive (no false
    # negatives ⇒ a real cache hit can never be missed)
    srcs = engine.triples.select(
        F.explode("sources").alias("url")).distinct()
    probed = srcs.withColumn(
        "m", engine._source_bloom.might_contain(F.col("url"))).collect()
    assert probed and all(r["m"] for r in probed)
