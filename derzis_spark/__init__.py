"""derzis_spark — a from-scratch PySpark-native path-aware web crawler.

Re-expresses the query/data-processing capabilities of the reference
crawler (andrefs/derzis, a TypeScript manager/worker/MongoDB system)
as a round-synchronous BSP engine over Spark DataFrames:

- URL-seen set with Bloom-filter pre-pass (cuckoo fallback for deletes)
- per-registered-domain politeness with robots.txt caching
- path-length / predicate-priority frontier queue
- fetch = join of the scheduled frontier against a Common-Crawl-style
  pages table ``(url, warc_ts, html, text, lang)``
- vectorized (Arrow/pandas) UDFs for URL canonicalization, byte-identical
  text extraction, and N-Triples parsing
- per-round parquet snapshot commits (Iceberg-style manifest emulation)
  giving deterministic mid-frontier resume

Nothing here is a port: the reference's event-driven lock machinery
(Redis pub/sub, Mongo CAS retries) collapses into deterministic
round-synchronous DataFrame jobs; see SURVEY.md §7.
"""

__version__ = "0.1.0"

from derzis_spark.config import CrawlConfig  # noqa: F401
