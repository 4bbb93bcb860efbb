"""Structured Streaming ops (derzis_spark/streaming.py): each op runs
under trigger(availableNow=True) over parquet files and must equal the
identical batch computation on the same input — the streaming version
of the repo's dual-expression (Spark vs oracle) contract."""

import datetime as dt
import os
import shutil

import pytest

from pyspark.sql import functions as F

from derzis_spark import streaming as S


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def _write_events(spark, path, rows, n_files=1):
    """rows: (event_id, ts, event_type, url). Written as n_files
    separate parquet files so maxFilesPerTrigger can split them into
    separate micro-batches."""
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, "
              "url string")
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = rows[i * per:(i + 1) * per]
        if not chunk:
            continue
        spark.createDataFrame(chunk, df.schema).coalesce(1) \
            .write.mode("append").parquet(path)
    return df


@pytest.fixture
def events_rows():
    rows = []
    eid = 0
    for minute, etype, url in [
            (0, "fetch", "http://a.org/0"), (1, "fetch", "http://a.org/1"),
            (2, "extract", "http://a.org/0"), (6, "fetch", "http://b.org/0"),
            (7, "extract", "http://b.org/0"), (8, "fetch", "http://a.org/2"),
            (11, "fetch", "http://a.org/0"), (12, "error", "http://c.org/0"),
    ]:
        rows.append((eid, _ts(minute), etype, url))
        eid += 1
    return rows


def test_windowed_rate_matches_batch(spark, tmp_path, events_rows):
    src = str(tmp_path / "events")
    batch_df = _write_events(spark, src, events_rows, n_files=3)

    stream = S.read_event_stream(spark, src)
    out = S.run_available_now(
        S.windowed_event_rate(stream, window="5 minutes"),
        str(tmp_path / "ckpt"), "rate_avail", output_mode="complete")

    want = sorted(
        tuple(r) for r in
        S.windowed_event_rate(spark.read.parquet(src),
                              window="5 minutes").collect())
    got = sorted(tuple(r) for r in out.collect())
    assert got == want and len(got) > 0
    # sanity: the 10:00-10:05 window holds 2 fetches + 1 extract
    first = [g for g in got if g[0] == _ts(0) and g[2] == "fetch"]
    assert first and first[0][3] == 2


def test_streaming_dedup_state_spans_microbatches(spark, tmp_path,
                                                  events_rows):
    """Duplicate URLs arriving in DIFFERENT micro-batches must still
    dedup (the state store carries the seen set across batches):
    maxFilesPerTrigger=1 forces one file per micro-batch."""
    src = str(tmp_path / "events")
    _write_events(spark, src, events_rows, n_files=4)
    n_parts = len([f for f in os.listdir(src)
                   if f.startswith("part-")])
    assert n_parts >= 3  # the dedup below really spans batches

    stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
    out = S.run_available_now(
        S.streaming_dedup(stream, ["url"], watermark="1 hour"),
        str(tmp_path / "ckpt2"), "dedup_avail")

    got_urls = [r["url"] for r in out.collect()]
    assert sorted(got_urls) == sorted(set(got_urls))
    assert set(got_urls) == {r[3] for r in events_rows}


def test_dedup_matches_batch_first_arrival(spark, tmp_path,
                                           events_rows):
    """Streaming dedup keeps one row per URL; batch equivalent = min
    event_id per URL (files arrive in event order here). Event-id sets
    must match exactly."""
    src = str(tmp_path / "events")
    _write_events(spark, src, events_rows, n_files=4)
    stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
    out = S.run_available_now(
        S.streaming_dedup(stream, ["url"], watermark="1 hour"),
        str(tmp_path / "ckpt3"), "dedup_first")
    got = {(r["url"], r["event_id"]) for r in out.collect()}
    want = {(r["url"], r["min_id"]) for r in
            spark.read.parquet(src).groupBy("url")
            .agg(F.min("event_id").alias("min_id")).collect()}
    assert got == want


def test_stateful_domain_counters_match_batch(spark, tmp_path,
                                              events_rows):
    """Custom stateful operator (applyInPandasWithState): per-origin
    counters folded across micro-batches. The LAST emitted row per
    origin (counters are monotone, so max n_fetch picks it) must
    equal the batch groupBy pivot on the same input."""
    rows = [(eid, ts, etype, url, url.split("/")[2])
            for eid, ts, etype, url in events_rows]
    src = str(tmp_path / "events")
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, "
              "url string, origin string")
    per = (len(rows) + 3) // 4
    for i in range(4):
        chunk = rows[i * per:(i + 1) * per]
        if chunk:
            spark.createDataFrame(chunk, df.schema).coalesce(1) \
                .write.mode("append").parquet(src)

    stream = S.read_event_stream(spark, src, max_files_per_trigger=1)
    out = S.run_available_now(
        S.domain_counters_stateful(stream),
        str(tmp_path / "ckpt4"), "dom_counters", output_mode="update")

    # latest row per origin = the one with the largest counter sum
    latest = {}
    for r in out.collect():
        tot = r["n_fetch"] + r["n_extract"] + r["n_error"]
        if r["origin"] not in latest or tot > latest[r["origin"]][1]:
            latest[r["origin"]] = (
                (r["n_fetch"], r["n_extract"], r["n_error"]), tot)
    got = {o: v[0] for o, v in latest.items()}

    batch = spark.read.parquet(src)
    want = {}
    for r in (batch.groupBy("origin")
              .agg(*[F.sum(F.when(F.col("event_type") == t, 1)
                           .otherwise(0)).alias(t)
                     for t in ("fetch", "extract", "error")])
              .collect()):
        want[r["origin"]] = (r["fetch"], r["extract"], r["error"])
    assert got == want
