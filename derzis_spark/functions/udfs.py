"""Arrow-vectorized pandas UDFs wrapping the pure cores.

Per BASELINE.json ``input_hint``: *no per-row Python* — every UDF here
is a ``pandas_udf`` (Arrow batch transfer, one Python invocation per
batch). Everything expressible with built-in ``pyspark.sql.functions``
stays JVM-side; these UDFs cover only the genuinely non-SQL pieces:
URL canonicalization, robots matching, HTML text/triple extraction.

NOTE: no ``from __future__ import annotations`` here — pandas_udf
type-hint inference needs real (non-string) annotations.
"""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, BooleanType, DoubleType, StringType, StructField,
    StructType,
)

from derzis_spark.functions import core
from derzis_spark.schemas import RAW_TRIPLE


@pandas_udf(StringType())
def canonicalize_url(urls: pd.Series) -> pd.Series:
    return urls.map(core.canonicalize_url, na_action="ignore")


@pandas_udf(StringType())
def url_origin(urls: pd.Series) -> pd.Series:
    return urls.map(core.url_origin, na_action="ignore")


@pandas_udf(StructType([StructField("url", StringType()),
                        StructField("origin", StringType())]))
def canonicalize_with_origin(urls: pd.Series) -> pd.DataFrame:
    """Fused (canonical URL, origin) in ONE parse per input — the
    discovery hot loop canonicalizes and needs the origin of every new
    URL anyway; two separate UDFs would parse each URL twice (plus an
    extra Arrow round-trip)."""
    pairs = urls.map(core.canonicalize_with_origin, na_action="ignore")
    return pd.DataFrame(
        {"url": pairs.map(lambda p: p[0], na_action="ignore"),
         "origin": pairs.map(lambda p: p[1], na_action="ignore")})


@pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return html.map(core.extract_text, na_action="ignore")


@pandas_udf(ArrayType(RAW_TRIPLE))
def parse_page_triples(html: pd.Series) -> pd.Series:
    """html bytes → raw (unfiltered) triples; the validity filter
    (Worker.ts:599-657) is applied Spark-side in the engine so it stays
    in whole-stage codegen."""
    def one(h):
        ts = core.parse_ntriples(core.extract_ntriples_block(h))
        return [
            {
                "subject": t.subject,
                "predicate": t.predicate,
                "object_kind": t.object_kind,
                "object_value": t.object_value,
                "object_datatype": t.object_datatype,
                "object_language": t.object_language,
            }
            for t in ts
        ]
    return html.map(one, na_action="ignore")


@pandas_udf(BooleanType())
def has_rdf_content(html: pd.Series) -> pd.Series:
    """Accepted-MIME signal per page (Worker.ts:744-750 analog)."""
    return html.map(core.has_rdf_content)


@pandas_udf(StringType())
def alternate_url(html: pd.Series) -> pd.Series:
    """RDF alternate-link discovery (worker-utils.ts:122-160 analog)."""
    return html.map(core.find_alternate_url, na_action="ignore")


def make_page_stats(allow_blank_nodes: bool = False):
    """Fused per-page fetch+extract kernel: text extraction, N-Triples
    parse, quad-validity filter, and out-node canonicalization+dedup in
    one Arrow batch pass (struct result). Used by the mega-round batch
    job so the plan needs no row-multiplying explode between UDF
    stages."""
    @pandas_udf("text_len int, n_raw int, n_valid int, n_out_nodes int")
    def page_stats(html: pd.Series) -> pd.DataFrame:
        def one(h):
            text = core.extract_text(h)
            ts = core.parse_ntriples(core.extract_ntriples_block(h))
            n_valid = 0
            nodes = set()
            for t in ts:
                if t.object_value == "" or (
                    not allow_blank_nodes
                    and (t.subject.startswith("_:")
                         or t.object_kind == "blank")
                ):
                    continue
                n_valid += 1
                if t.object_kind == "uri":
                    c = core.canonicalize_url(t.object_value)
                    if c is not None:
                        nodes.add(c)
            return (len(text), len(ts), n_valid, len(nodes))
        rows = [one(h) for h in html]
        return pd.DataFrame(
            rows, columns=["text_len", "n_raw", "n_valid", "n_out_nodes"])
    return page_stats


def make_robots_allows(user_agent: str):
    @pandas_udf(BooleanType())
    def robots_allows(robots_txt: pd.Series, url: pd.Series) -> pd.Series:
        # parse each DISTINCT robots.txt once per batch (domains are far
        # fewer than URLs), then decide per group against the pre-parsed
        # rules — no per-row DataFrame.apply
        txts = robots_txt.map(
            lambda v: v if isinstance(v, str) else None)
        codes, uniques = pd.factorize(txts, use_na_sentinel=True)
        out = pd.Series(True, index=robots_txt.index, dtype=bool)
        codes = pd.Series(codes, index=robots_txt.index)
        for gi in range(-1, len(uniques)):
            mask = codes == gi
            if not mask.any():
                continue
            rules = core.parse_robots(
                None if gi < 0 else uniques[gi], user_agent)
            out[mask] = [
                core.robots_allows_rules(rules, u) for u in url[mask]]
        return out
    return robots_allows


def make_robots_crawl_delay(user_agent: str):
    @pandas_udf(DoubleType())
    def robots_crawl_delay(robots_txt: pd.Series) -> pd.Series:
        return robots_txt.map(
            lambda r: core.robots_crawl_delay(r, user_agent),
            na_action="ignore",
        )
    return robots_crawl_delay


def blank_node_ns(source_col, local_col):
    """Native-expression blank-node namespacing (Worker.ts:63-70):
    ``_:{source}:{local-without-_:}`` — stays JVM-side."""
    stripped = F.when(
        local_col.startswith("_:"), F.substring(local_col, 3, 1 << 30)
    ).otherwise(local_col)
    return F.concat(F.lit("_:"), source_col, F.lit(":"), stripped)
