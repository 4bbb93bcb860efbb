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


def make_pred_matcher(patterns: tuple):
    """Vectorized any-pattern predicate matcher (the above-
    ``pred_vocab_limit`` path of the pred-limitation filters): True
    where the predicate matches ANY of the config patterns
    (process-utils.ts semantics via core.matches_predicate_pattern).
    Each DISTINCT predicate in the batch is evaluated once
    (factorize), so a skewed batch costs O(distinct), not O(rows)."""
    pats = tuple(patterns)

    @pandas_udf(BooleanType())
    def pred_matches(preds: pd.Series) -> pd.Series:
        codes, uniques = pd.factorize(preds, use_na_sentinel=True)
        hits = [
            any(core.matches_predicate_pattern(p, w) for p in pats)
            for w in uniques
        ]
        return pd.Series(
            [False if c < 0 else hits[c] for c in codes],
            index=preds.index, dtype=bool)
    return pred_matches


def make_past_pred_checks(dis_pats: tuple, req_pats: tuple,
                          labels: tuple):
    """Array-level past-rule checks for the above-``pred_vocab_limit``
    regime, one Arrow pass per candidate's ``predicates`` array:
    ``has_dis`` = any element matches a disallow-past pattern and is
    not a label predicate; ``all_req`` = every element matches a
    require-past pattern or is a label predicate — exactly the
    driver path's ``exists(p in dis_past-labels)`` /
    ``forall(p in req_past|labels)`` literal-set semantics. Per-array
    match results are memoized across the batch (paths in one batch
    share most predicates)."""
    dis, req, labs = tuple(dis_pats), tuple(req_pats), set(labels)

    @pandas_udf("has_dis boolean, all_req boolean")
    def past_checks(arrs: pd.Series) -> pd.DataFrame:
        memo = {}

        def flags(w):
            if w not in memo:
                memo[w] = (
                    any(core.matches_predicate_pattern(p, w)
                        for p in dis) and w not in labs,
                    any(core.matches_predicate_pattern(p, w)
                        for p in req) or w in labs,
                )
            return memo[w]

        rows = []
        for arr in arrs:
            elems = [] if arr is None else list(arr)
            fl = [flags(w) for w in elems]
            rows.append((any(f[0] for f in fl),
                         all(f[1] for f in fl)))
        return pd.DataFrame(rows, columns=["has_dis", "all_req"])
    return past_checks


def make_step_pred_stats(rf: tuple, dfu: tuple, dp: tuple, rp: tuple):
    """Array-level pattern stats for the scheduling-side filter's
    above-``pred_vocab_limit`` regime (``_step_path_filter`` — no
    label exemption there): per ``predicates`` array, ``any_rf`` /
    ``any_dp`` = some element matches a require-future /
    disallow-past pattern; ``all_dfu`` / ``all_rp`` = every element
    matches a disallow-future / require-past pattern (empty array →
    False / True respectively, mirroring exists/forall over empty
    arrays). Distinct elements are memoized across the batch."""
    pats = {"rf": tuple(rf), "dfu": tuple(dfu),
            "dp": tuple(dp), "rp": tuple(rp)}

    @pandas_udf("any_rf boolean, all_dfu boolean, "
                "any_dp boolean, all_rp boolean")
    def step_stats(arrs: pd.Series) -> pd.DataFrame:
        memo = {}

        def flags(w):
            if w not in memo:
                memo[w] = {k: any(
                    core.matches_predicate_pattern(p, w) for p in ps)
                    for k, ps in pats.items()}
            return memo[w]

        rows = []
        for arr in arrs:
            fl = [flags(w) for w in ([] if arr is None else arr)]
            rows.append((any(f["rf"] for f in fl),
                         all(f["dfu"] for f in fl),
                         any(f["dp"] for f in fl),
                         all(f["rp"] for f in fl)))
        return pd.DataFrame(
            rows, columns=["any_rf", "all_dfu", "any_dp", "all_rp"])
    return step_stats


def blank_node_ns(source_col, local_col):
    """Native-expression blank-node namespacing (Worker.ts:63-70):
    ``_:{source}:{local-without-_:}`` — stays JVM-side."""
    stripped = F.when(
        local_col.startswith("_:"), F.substring(local_col, 3, 1 << 30)
    ).otherwise(local_col)
    return F.concat(F.lit("_:"), source_col, F.lit(":"), stripped)
