"""fetch_extract_batch must agree with a pure-Python evaluation of the
same pipeline (robots gate → fetch → extract → parse → validity filter
→ node discovery) over the fixture."""

from derzis_spark.fixtures import generate_fixture
from derzis_spark.functions import core
from derzis_spark.operators.batch_fetch import (
    fetch_extract_batch, fetch_extract_stats)
from tests.conftest import fixture_dataframes


def python_oracle(fx, user_agent="derzis-spark"):
    robots = {o: (s, t) for o, s, t in fx.robots_rows()}
    pages = {u: h for u, h in zip(fx.urls, fx.html)}
    fetched = 0
    text_bytes = 0
    raw = valid = out_nodes = 0
    for url in fx.urls:
        origin = core.url_origin(url)
        status, txt = robots.get(origin, ("not_found", ""))
        txt = txt if status == "ok" else ""
        if not core.robots_allows(txt, url, user_agent):
            continue
        html = pages[url]
        text = core.extract_text(html)
        ts = core.parse_ntriples(core.extract_ntriples_block(html))
        fetched += 1
        text_bytes += len(text)
        raw += len(ts)
        nodes = set()
        for t in ts:
            if t.object_value == "" or t.subject.startswith("_:") \
                    or t.object_kind == "blank":
                continue
            valid += 1
            if t.object_kind == "uri":
                c = core.canonicalize_url(t.object_value)
                if c is not None:
                    nodes.add(c)
        out_nodes += len(nodes)
    return dict(fetched=fetched, text_bytes=text_bytes, raw_triples=raw,
                valid_triples=valid, out_nodes=out_nodes)


def test_batch_matches_python_oracle(spark):
    fx = generate_fixture(n_pages=300, n_origins=10, n_seeds=5, seed=11,
                          out_links=5)
    pages, robots, _ = fixture_dataframes(spark, fx)
    frontier = spark.createDataFrame(
        [(u, core.url_origin(u)) for u in fx.urls],
        "url string, origin string")
    got = fetch_extract_batch(spark, frontier, pages, robots)
    want = python_oracle(fx)
    assert got == want


def test_fused_matches_unfused(spark):
    """The fused single-UDF kernel must produce identical totals to the
    staged explode pipeline."""
    fx = generate_fixture(n_pages=300, n_origins=10, n_seeds=5, seed=11,
                          out_links=5)
    pages, robots, _ = fixture_dataframes(spark, fx)
    frontier = spark.createDataFrame(
        [(u, core.url_origin(u)) for u in fx.urls],
        "url string, origin string")
    staged = fetch_extract_batch(spark, frontier, pages, robots)
    fused = fetch_extract_batch(spark, frontier, pages, robots, fused=True)
    assert fused == staged
    # frontier=None (full-corpus mega-round) must agree too: here the
    # frontier covers every page, so the results coincide
    full = fetch_extract_batch(spark, None, pages, robots, fused=True)
    assert full == staged


def test_stats_text_byte_identical(spark):
    """Extracted text must be byte-identical to the fixture text column
    (BASELINE.json input_hint) — checked through the batch plan."""
    fx = generate_fixture(n_pages=120, n_origins=6, n_seeds=4, seed=3)
    pages, robots, _ = fixture_dataframes(spark, fx)
    frontier = spark.createDataFrame(
        [(u, core.url_origin(u)) for u in fx.urls],
        "url string, origin string")
    stats = fetch_extract_stats(spark, frontier, pages, robots)
    text_len = {u: len(t) for u, t in zip(fx.urls, fx.text)}
    for r in stats.select("url", "text_len").collect():
        assert r["text_len"] == text_len[r["url"]]


def test_vector_bloom_build_probe_merge(spark):
    """The seen-set Bloom path (xxhash64 JVM-side, vectorized numpy
    probe over the broadcast word array) must have zero false
    negatives, a plausible false-positive rate, and a merge that
    behaves like rebuilding over the union."""
    from pyspark.sql import functions as F
    from derzis_spark.operators.seen_set import BloomFilter

    seen = [f"https://o{i % 7}.example.org/p/{i}" for i in range(2000)]
    df = spark.createDataFrame([(u,) for u in seen], "url string") \
        .repartition(8)
    bf = BloomFilter.build(spark, df, "url", capacity=10_000, fpp=0.01)

    def probe(urls):
        pdf = spark.createDataFrame([(u,) for u in urls], "url string")
        return {
            r["url"]: r["m"] for r in pdf.select(
                "url", bf.might_contain(F.col("url")).alias("m")).collect()
        }

    got = probe(seen)
    assert all(got.values())  # no false negatives
    unseen = [f"https://other.example.net/x/{i}" for i in range(2000)]
    fp = sum(probe(unseen).values())
    assert fp < 2000 * 0.05  # ~1% fpp with slack
    # merge: fold a second batch in, old and new keys must both hit
    extra = [f"https://extra.example.org/e/{i}" for i in range(500)]
    bf.merge_from(
        spark.createDataFrame([(u,) for u in extra], "url string"), "url")
    got2 = probe(seen + extra)
    assert all(got2.values())


def test_vector_bloom_partitioning_invariant(spark):
    """Executor-side construction (per-partition partial word arrays,
    OR-folded) must be bit-identical regardless of partitioning — the
    bit content depends only on the key set."""
    import numpy as np
    from derzis_spark.operators.seen_set import BloomFilter

    urls = [f"https://o{i % 7}.example.org/p/{i}" for i in range(500)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    one = BloomFilter.build(spark, df.coalesce(1), "url", capacity=10_000)
    many = BloomFilter.build(
        spark, df.repartition(8), "url", capacity=10_000)
    assert np.array_equal(one.words, many.words)
    assert one.words.any()
