"""WARC source round-trip + composition tests.

Oracle: the writer and reader are independent directions over the
public WARC/1.0 spec — a round-trip through real files (gzip member
layout AND plain) must reproduce the original pages rows exactly, and
the reader's output must compose with the fetch/extract pipeline to
byte-identical extracted text."""

import datetime as dt
import glob
import os

import pytest

from derzis_spark.fixtures import generate_fixture
from derzis_spark.functions import core
from derzis_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    warc_to_pages,
    write_warc,
)


def _write_fixture_warcs(tmp_path, fx, n_files=3):
    """Spread the fixture's pages across n_files, alternating gzip /
    plain and with request records interleaved in one file."""
    rows = list(zip(fx.urls, fx.warc_ts, fx.html))
    paths = []
    for i in range(n_files):
        chunk = rows[i::n_files]
        gz = i % 2 == 0
        p = os.path.join(
            str(tmp_path), f"part-{i}.warc" + (".gz" if gz else ""))
        write_warc(chunk, p, gzip_per_record=gz,
                   with_request_records=(i == 0))
        paths.append(p)
    return paths


@pytest.fixture(scope="module")
def fx():
    return generate_fixture(n_pages=120, n_origins=8, n_seeds=5, seed=7)


def test_roundtrip_exact(spark, tmp_path, fx):
    paths = _write_fixture_warcs(tmp_path, fx)
    out = read_warc(spark, os.path.join(str(tmp_path), "*.warc*"))
    got = {
        r["url"]: (r["warc_ts"], bytes(r["html"]), r["http_status"],
                   r["content_type"])
        for r in out.collect()
    }
    assert len(got) == len(fx.urls)
    for url, ts, html in zip(fx.urls, fx.warc_ts, fx.html):
        g_ts, g_html, g_status, g_ctype = got[url]
        assert g_html == html, url  # byte-identical payload
        # timestamps survive to second precision (WARC-Date granularity)
        assert g_ts.replace(tzinfo=dt.timezone.utc) == ts
        assert g_status == 200
        assert g_ctype.startswith("text/html")


def test_reader_skips_non_response_records(tmp_path, fx):
    p = os.path.join(str(tmp_path), "one.warc.gz")
    write_warc(list(zip(fx.urls[:5], fx.warc_ts[:5], fx.html[:5])), p,
               gzip_per_record=True, with_request_records=True)
    from derzis_spark.sources.warc import _open_warc

    with _open_warc(p) as st:
        recs = list(iter_warc_records(st, "one.warc.gz"))
    # warcinfo + 5 requests are skipped; exactly the 5 responses remain
    assert [r["url"] for r in recs] == fx.urls[:5]


def test_empty_and_degenerate_files(spark, tmp_path):
    # zero-record file (only warcinfo), an empty file, and a
    # zero-length body record must not break the distributed read
    p0 = os.path.join(str(tmp_path), "a.warc.gz")
    write_warc([], p0)
    p1 = os.path.join(str(tmp_path), "b.warc")
    open(p1, "wb").close()
    p2 = os.path.join(str(tmp_path), "c.warc")
    ts = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    write_warc([("http://x.example/empty", ts, b"")], p2,
               gzip_per_record=False)
    out = read_warc(spark, [p0, p1, p2]).collect()
    assert len(out) == 1
    assert out[0]["url"] == "http://x.example/empty"
    assert bytes(out[0]["html"]) == b""


def test_warc_to_pages_feeds_extraction(spark, tmp_path, fx):
    """Composition: WARC → pages shape → extract UDF gives the same
    bytes-identical text as the pure-Python reference extractor."""
    from derzis_spark.functions import udfs

    paths = _write_fixture_warcs(tmp_path, fx)
    pages = warc_to_pages(read_warc(spark, paths))
    assert [f.name for f in pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"]
    got = {
        r["url"]: r["extracted"]
        for r in pages.select(
            "url", udfs.extract_text("html").alias("extracted")
        ).collect()
    }
    for url, html in zip(fx.urls, fx.html):
        assert got[url] == core.extract_text(html), url


def test_warc_sink_roundtrip(spark, tmp_path, fx):
    """Distributed sink → reader round-trip: executor-written shards
    re-read to the exact (url, html, warc_ts) set, and the returned
    manifest accounts for every record."""
    from derzis_spark import schemas
    from derzis_spark.sources.warc import write_warc_df

    pages = spark.createDataFrame(fx.pages_rows(), schemas.PAGES)
    out = os.path.join(str(tmp_path), "sink")
    manifest = write_warc_df(pages.repartition(4, "url"), out).collect()
    assert sum(m["n_records"] for m in manifest) == len(fx.urls)
    assert len(manifest) == len(
        glob.glob(os.path.join(out, "*.warc.gz")))
    back = read_warc(spark, os.path.join(out, "*.warc.gz"))
    got = {r["url"]: (bytes(r["html"]), r["warc_ts"])
           for r in back.collect()}
    assert len(got) == len(fx.urls)
    for url, ts, html in zip(fx.urls, fx.warc_ts, fx.html):
        assert got[url][0] == html
        assert got[url][1].replace(tzinfo=dt.timezone.utc) == ts


def test_parallelism_spreads_files(spark, tmp_path, fx):
    paths = _write_fixture_warcs(tmp_path, fx, n_files=6)
    df = read_warc(spark, paths, parallelism=3)
    # file paths parallelize across exactly 3 tasks
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == len(fx.urls)
