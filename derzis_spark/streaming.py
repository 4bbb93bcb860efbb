"""Structured Streaming surface for the continuously-arriving side of
the crawl: event telemetry rates and unbounded-stream deduplication.

The crawl engine itself is round-synchronous by design (SURVEY §7.0:
each round is a deterministic batch job so the trace is
oracle-checkable bit-for-bit) — but a deployment also has genuinely
unbounded inputs where Structured Streaming is the right Spark
expression: the fetch/extract event firehose that feeds the
process-data.ts rate metrics (reference: process-data.ts:587-599, the
trailing-window crawl rate the batch ``q_crawl_rate_window`` operator
computes), and discovery streams that need URL-seen dedup before they
reach the frontier.

Design rules, mirrored from the batch engine:

- **Watermarks bound state.** Every stateful op takes an event-time
  watermark so window/dedup state is dropped once event time passes —
  the streaming analog of the Bloom-gated seen set: without it, state
  on a 10^10-URL stream grows without bound.
- **Same JVM expressions as batch.** The window aggregation is the
  plain ``groupBy(window(ts), …).count()`` Catalyst plan; dedup is
  the built-in watermarked ``dropDuplicates`` state store. No Python
  in the hot path.
- **Batch parity is the oracle.** Each op has a test that runs the
  stream with ``trigger(availableNow=True)`` over files and asserts
  the result equals the identical batch computation on the same input
  (tests/test_streaming.py) — the same dual-expression contract as
  the DuckDB-checked batch operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = None
                      ) -> DataFrame:
    """File-source stream over a directory of event parquet (schema
    inferred from the files already present — a deployment pins it
    explicitly). ``max_files_per_trigger`` caps each micro-batch, the
    knob that bounds per-batch memory on a backlogged directory."""
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    return reader.parquet(path)


def windowed_event_rate(events: DataFrame, window: str = "5 minutes",
                        slide: str | None = None,
                        watermark: str = "10 minutes") -> DataFrame:
    """Per-event-type counts in tumbling (or sliding) event-time
    windows — the streaming form of the trailing-window crawl rate
    (process-data.ts:587-599 / batch ``q_crawl_rate_window``). The
    watermark lets finished windows emit and their state drop; late
    events beyond it are discarded, exactly the trade the reference's
    "recent events" metric makes by re-querying a trailing interval.
    Works identically on a batch DataFrame (watermark is a no-op
    there) — the parity surface the tests use."""
    win = F.window("ts", window, slide) if slide else \
        F.window("ts", window)
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(win.alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"),
                "event_type", "n_events")
    )


def streaming_dedup(events: DataFrame, keys: list[str],
                    watermark: str = "10 minutes") -> DataFrame:
    """First-arrival dedup over an unbounded stream: watermarked
    ``dropDuplicates`` keeps exactly one row per key tuple, with the
    state store evicting keys older than the watermark — the
    streaming analog of the engine's Bloom-gated URL-seen anti-join
    (bounded state, no growth with stream length). State persists
    across micro-batches (pinned by the maxFilesPerTrigger=1 test)."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return events.dropDuplicates(keys)


#: output schema of domain_counters_stateful
DOMAIN_COUNTERS_SCHEMA = (
    "origin string, n_fetch long, n_extract long, n_error long")

#: per-group state: the running counters (3 longs per origin)
_DOMAIN_STATE_SCHEMA = "n_fetch long, n_extract long, n_error long"


def _update_domain_counters(key, pdfs, state):
    """applyInPandasWithState update function: fold this micro-batch's
    events for one origin into the running (fetch, extract, error)
    counters and emit the updated row. Pure pandas on Arrow batches —
    no per-row Python."""
    import pandas as pd

    # GroupState.get is a property in pyspark 4 (raises if absent)
    nf, nx, ne = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        nf += int((pdf["event_type"] == "fetch").sum())
        nx += int((pdf["event_type"] == "extract").sum())
        ne += int((pdf["event_type"] == "error").sum())
    state.update((nf, nx, ne))
    yield pd.DataFrame([{
        "origin": key[0], "n_fetch": nf, "n_extract": nx,
        "n_error": ne,
    }])


def domain_counters_stateful(events: DataFrame,
                             watermark: str = "1 hour") -> DataFrame:
    """Per-domain running crawl counters as a CUSTOM stateful
    streaming operator (``applyInPandasWithState`` — the API for
    state machines the built-in aggs can't express; here the running
    shape mirrors the reference's per-domain $inc counters,
    Domain.ts:239-258 / batch ``q_domain_queue_counters``). Events
    group by origin; each micro-batch folds into per-origin state and
    emits the updated row, so the sink always holds the latest
    counters per domain. State is one tiny tuple per origin —
    bounded by the domain dimension, not the stream. Requires an
    ``origin`` column (derive with the engine's canonicalize UDF
    upstream)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy("origin")
        .applyInPandasWithState(
            _update_domain_counters,
            outputStructType=DOMAIN_COUNTERS_SCHEMA,
            stateStructType=_DOMAIN_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout)
    )


def run_available_now(stream_df: DataFrame, checkpoint: str,
                      name: str, output_mode: str = "append"
                      ) -> DataFrame:
    """Drain everything currently in the stream into an in-memory
    table (trigger availableNow: process all pending input in
    micro-batches, then stop) and return it as a batch DataFrame —
    the deterministic harness the parity tests run streams under.
    A deployment swaps the memory sink for parquet/Kafka and drops
    the awaitTermination."""
    q = (stream_df.writeStream.format("memory")
         .queryName(name).outputMode(output_mode)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
