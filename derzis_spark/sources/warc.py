"""WARC source: read Common-Crawl-style WARC files into the ``pages``
table shape (url, warc_ts, html, …).

The north-star input is "an Iceberg table of Common-Crawl-style web
pages" — this module is the connector that POPULATES that table from
the archive format Common Crawl actually publishes: WARC/1.0 files
(ISO 28500), one gzip member per record in the ``.warc.gz`` layout.
Everything here is a from-scratch implementation of the public spec —
no warcio/external libs.

Spark shape (the part that must survive 100 TB):

- **Files are the parallelism unit.** A Common-Crawl segment is
  ~50k-100k independent ``.warc.gz`` files of ~1 GiB; per-record gzip
  members make the files non-splittable in practice, so the idiomatic
  Spark plan is one task per file (or per batch of files), exactly how
  the binaryFile source and every production WARC job treats them.
  ``read_warc`` therefore parallelizes over a *path list* and each
  task STREAMS its file through the stdlib gzip reader — the 1 GiB
  file content never materializes as a single Tungsten row (the
  binaryFile source would carry the whole file as one BinaryType cell
  through the scan; at CC file sizes that is an OOM-shaped row).
- **mapInPandas, record-batched output.** The parser is a generator:
  each task opens its files, walks records sequentially, and yields
  Arrow batches of ``WARC_BATCH`` rows — bounded memory per task
  regardless of file size.
- **Record filtering is pushed into the parser.** Only
  ``WARC-Type: response`` records become rows; request/metadata/
  warcinfo records are skipped while scanning, so the shuffle-free
  output carries exactly the page rows the crawl consumes.
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import os
from datetime import datetime, timezone
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: output schema of read_warc (a superset of the PAGES input columns:
#: url + warc_ts + html are the crawl's inputs; content_type /
#: http_status / warc_file are provenance)
WARC_SCHEMA = (
    "url string, warc_ts timestamp, html binary, "
    "content_type string, http_status int, warc_file string"
)

_CRLF = b"\r\n"
_GZ_MAGIC = b"\x1f\x8b"


# ---------------------------------------------------------------------------
# writer (fixture/export side)
# ---------------------------------------------------------------------------

def _warc_date(ts: datetime | None) -> str:
    if ts is None:
        ts = datetime(1970, 1, 1)
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _record(warc_type: str, headers: dict[str, str],
            payload: bytes) -> bytes:
    """Serialize one WARC/1.0 record (spec: header block, CRLF CRLF,
    Content-Length payload bytes, CRLF CRLF)."""
    lines = [b"WARC/1.0"]
    hdrs = {"WARC-Type": warc_type, **headers,
            "Content-Length": str(len(payload))}
    for k, v in hdrs.items():
        lines.append(f"{k}: {v}".encode("utf-8"))
    head = _CRLF.join(lines) + _CRLF + _CRLF
    return head + payload + _CRLF + _CRLF


def write_warc(records: Iterable[tuple], path: str,
               gzip_per_record: bool = True,
               with_request_records: bool = False) -> int:
    """Write ``(url, warc_ts, html)`` tuples as a WARC file at
    ``path``. ``gzip_per_record=True`` produces the Common-Crawl
    ``.warc.gz`` layout (one gzip member per record, concatenated);
    False produces a plain ``.warc``. Returns the record count
    (responses only). A leading ``warcinfo`` record and (optionally)
    a ``request`` record per response exercise the reader's
    type-filtering path."""
    n = 0

    def emit(buf, raw: bytes):
        if gzip_per_record:
            buf.write(gzip.compress(raw))
        else:
            buf.write(raw)

    with open(path, "wb") as f:
        info = _record("warcinfo", {
            "WARC-Date": _warc_date(None),
            "WARC-Record-ID": "<urn:uuid:warcinfo-0>",
            "Content-Type": "application/warc-fields",
        }, b"software: derzis-spark-warc-writer/1.0\r\n")
        emit(f, info)
        for i, (url, ts, html) in enumerate(records):
            if with_request_records:
                req_payload = (
                    f"GET {url} HTTP/1.1\r\nHost: x\r\n\r\n"
                ).encode("utf-8")
                emit(f, _record("request", {
                    "WARC-Date": _warc_date(ts),
                    "WARC-Record-ID": f"<urn:uuid:req-{i}>",
                    "WARC-Target-URI": url,
                    "Content-Type": "application/http;msgtype=request",
                }, req_payload))
            body = html if html is not None else b""
            http = (b"HTTP/1.1 200 OK\r\n"
                    b"Content-Type: text/html; charset=utf-8\r\n"
                    b"Content-Length: " + str(len(body)).encode()
                    + b"\r\n\r\n" + body)
            emit(f, _record("response", {
                "WARC-Date": _warc_date(ts),
                "WARC-Record-ID": f"<urn:uuid:resp-{i}>",
                "WARC-Target-URI": url,
                "Content-Type": "application/http;msgtype=response",
            }, http))
            n += 1
    return n


# ---------------------------------------------------------------------------
# parser (streaming, pure stdlib)
# ---------------------------------------------------------------------------

def _parse_http_response(payload: bytes) -> tuple[int | None, str | None,
                                                  bytes]:
    """Split an HTTP response payload into (status, content_type,
    body). Tolerant: a payload with no header/body separator is
    treated as all-body with unknown status."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, payload
    head, body = payload[:sep], payload[sep + 4:]
    status = None
    ctype = None
    for j, line in enumerate(head.split(b"\r\n")):
        if j == 0:
            parts = line.split(b" ")
            if len(parts) >= 2 and parts[1].isdigit():
                status = int(parts[1])
            continue
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
    return status, ctype, body


def _parse_warc_ts(val: str) -> datetime | None:
    try:
        return datetime.strptime(
            val, "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=timezone.utc)
    except ValueError:
        return None


def iter_warc_records(stream: io.BufferedIOBase,
                      warc_file: str = "") -> Iterator[dict]:
    """Walk WARC records sequentially off a (decompressed) byte
    stream, yielding one dict per ``response`` record. Bounded memory:
    only one record's payload is held at a time."""
    while True:
        line = stream.readline()
        if not line:
            return
        if line.strip() == b"":  # inter-record CRLFs
            continue
        if not line.startswith(b"WARC/"):
            # damaged/unknown leading bytes: skip to next record marker
            continue
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if not h or h.strip() == b"":
                break
            k, _, v = h.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = \
                v.strip().decode("latin-1")
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        payload = stream.read(length) if length > 0 else b""
        if headers.get("warc-type") != "response":
            continue
        status, ctype, body = _parse_http_response(payload)
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_ts": _parse_warc_ts(headers.get("warc-date", "")),
            "html": body,
            "content_type": ctype,
            "http_status": status,
            "warc_file": warc_file,
        }


def _open_warc(path: str) -> io.BufferedIOBase:
    """Open plain or gzipped WARC for streaming. The stdlib gzip
    reader consumes concatenated members transparently, which is
    exactly the CC per-record-member layout."""
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == _GZ_MAGIC:
        return io.BufferedReader(gzip.GzipFile(fileobj=f))  # type: ignore
    return io.BufferedReader(f)


# ---------------------------------------------------------------------------
# Spark reader
# ---------------------------------------------------------------------------

def _int_conf(spark: SparkSession, key: str) -> int:
    """Read an int Spark conf defensively: some platforms set values
    like ``auto`` for shuffle partitions — fall back to the cluster's
    default parallelism instead of raising before any work runs."""
    try:
        return int(spark.conf.get(key))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def read_warc(spark: SparkSession, paths: str | list[str],
              parallelism: int | None = None,
              batch_rows: int = 1024) -> DataFrame:
    """Distributed WARC read: one row per ``response`` record.

    ``paths`` is a glob or an explicit path list; the listing is
    O(file count) driver metadata (exactly what every file source
    holds), the file BYTES are only ever touched executor-side. Each
    task streams its files through the gzip/plain reader and emits
    ``batch_rows``-sized Arrow batches, so per-task memory is bounded
    by batch size — not file size, not record count."""
    if isinstance(paths, str):
        file_list = sorted(_glob.glob(paths))
    else:
        file_list = sorted(paths)
    if parallelism is None:
        parallelism = max(1, min(
            len(file_list),
            _int_conf(spark, "spark.sql.shuffle.partitions")))
    pdf = spark.createDataFrame(
        [(p,) for p in file_list], "path string")
    # spread files round-robin across tasks (files vary wildly in
    # record count; hash-of-path would skew small task counts)
    pdf = pdf.repartition(parallelism)

    def parse(batches):
        import pandas as pd

        def to_pdf(rows: list[dict]) -> pd.DataFrame:
            out = pd.DataFrame(rows)
            # pin Arrow-friendly dtypes: tz-aware timestamps and a
            # nullable int (None rows otherwise force object dtype)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True)
            out["http_status"] = out["http_status"].astype("Int64")
            return out

        rows: list[dict] = []
        for pb in batches:
            for path in pb["path"]:
                with _open_warc(path) as st:
                    for rec in iter_warc_records(
                            st, os.path.basename(path)):
                        rows.append(rec)
                        if len(rows) >= batch_rows:
                            yield to_pdf(rows)
                            rows = []
        if rows:
            yield to_pdf(rows)

    return pdf.mapInPandas(parse, WARC_SCHEMA)


def write_warc_df(df: DataFrame, out_dir: str,
                  gzip_per_record: bool = True) -> DataFrame:
    """Distributed WARC sink: write ``(url, warc_ts, html)`` rows as
    one WARC file per partition under ``out_dir`` (the N-files layout
    every archive pipeline shards into). The files are written
    EXECUTOR-side — the driver never sees a page byte; the returned
    (warc_file, n_records) frame is the write manifest, one row per
    produced file. Partition the input by whatever sharding the
    archive should have (e.g. ``df.repartition(k, "url")``) before
    calling.

    Filesystem note (applies to ``read_warc`` too): this connector
    writes/reads through plain ``open()``/``glob`` on the executors
    and ``os.makedirs`` on the driver — it assumes a filesystem
    shared by driver and executors (local mode, NFS, or a FUSE mount
    of object storage). Everything else in the repo reads through
    Spark's Hadoop FS layer; point this connector at a mounted path
    on a real cluster."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_per_record else ".warc"

    def write_part(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        n = 0
        it = (
            (r.url, None if pd.isna(r.warc_ts) else
             r.warc_ts.to_pydatetime(),
             # null html → empty body, matching write_warc's own
             # None handling (bytes(None) raises)
             b"" if r.html is None else bytes(r.html))
            for pb in batches
            for r in pb.itertuples(index=False))
        n = write_warc(it, path, gzip_per_record=gzip_per_record)
        if n == 0:
            os.remove(path)  # empty partition: no empty-shard litter
            return
        yield pd.DataFrame(
            [{"warc_file": os.path.basename(path), "n_records": n}])

    return df.select("url", "warc_ts", "html").mapInPandas(
        write_part, "warc_file string, n_records long")


def warc_to_pages(warc_df: DataFrame) -> DataFrame:
    """Project a read_warc frame to the engine's PAGES input columns
    (text/lang stay null — they are extraction OUTPUTS the fetch
    pipeline fills in)."""
    return warc_df.select(
        "url", "warc_ts", "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
