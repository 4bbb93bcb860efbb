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


def test_bloom_from_dataframe_matches_driver_build(spark):
    """Executor-side Bloom construction (treeAggregate of per-partition
    partials) must produce bit-identical filters to a driver-side add
    loop — union is an OR of deterministic per-element bit patterns."""
    import numpy as np
    from derzis_spark.operators.seen_set import (
        BloomFilter, bloom_from_dataframe)

    urls = [f"https://o{i % 7}.example.org/p/{i}" for i in range(500)]
    df = spark.createDataFrame([(u,) for u in urls], "url string") \
        .repartition(8)
    dist = bloom_from_dataframe(df, "url", capacity=10_000)
    local = BloomFilter(10_000)
    for u in urls:
        local.add(u)
    assert np.array_equal(dist.bits, local.bits)
    assert all(dist.might_contain(u) for u in urls)
