"""Alternate-URL redirect discovery (Worker.ts:744-766,
worker-utils.ts:122-160): wrong-MIME pages chase their RDF alternate
link up to max_redirects hops; failures classify as MIME /
too-many-redirects / not-found errors.

Unit tests mirror worker/src/lib/worker-utils.spec.ts's redirect
discovery coverage; the end-to-end test is the usual engine-vs-oracle
exact-trace gate over a fixture with alternate chains enabled."""

from derzis_spark.config import CrawlConfig
from derzis_spark.fixtures import generate_fixture, _redirect_page_html
from derzis_spark.functions.core import (
    find_alternate_url,
    has_rdf_content,
)
from derzis_spark.oracle import run_oracle_on_fixture
from tests.test_engine_matches_oracle import assert_match, run_both


# ---------------------------------------------------------------------------
# unit: link discovery (worker-utils.ts:146-160 parity)
# ---------------------------------------------------------------------------

def test_find_alternate_basic():
    html = _redirect_page_html("hello", "https://x.org/alt/1")
    assert not has_rdf_content(html)
    assert find_alternate_url(html) == "https://x.org/alt/1"


def test_find_alternate_attribute_order_free():
    html = (b'<html><head><link href="https://x.org/a.nt" '
            b'type="application/n-triples" rel="alternate"></head></html>')
    assert find_alternate_url(html) == "https://x.org/a.nt"


def test_find_alternate_mime_priority_order():
    # text/turtle outranks application/n-triples even when it appears
    # later in the document (findUrlInHtml iterates mimes, not tags)
    html = (b'<html><head>'
            b'<link rel="alternate" type="application/n-triples" '
            b'href="https://x.org/a.nt">'
            b'<link rel="alternate" type="text/turtle" '
            b'href="https://x.org/a.ttl">'
            b'</head></html>')
    assert find_alternate_url(html) == "https://x.org/a.ttl"


def test_find_alternate_ignores_non_alternate_and_wrong_type():
    html = (b'<html><head>'
            b'<link rel="stylesheet" href="https://x.org/s.css">'
            b'<link rel="alternate" type="text/html" href="https://x.org/h">'
            b'</head></html>')
    assert find_alternate_url(html) is None


def test_find_alternate_none_on_rdf_page():
    from derzis_spark.fixtures import _page_html
    assert has_rdf_content(_page_html("t", []))
    assert find_alternate_url(_redirect_page_html("t", None)) is None


# ---------------------------------------------------------------------------
# unit: oracle chain semantics (handleHttpResponse recursion)
# ---------------------------------------------------------------------------

def _fixture_with_alts():
    return generate_fixture(n_pages=160, n_origins=8, n_seeds=5, seed=7,
                            alt_rate=0.25)


def test_fixture_contains_all_failure_modes():
    fx = _fixture_with_alts()
    cfg = CrawlConfig(max_path_length=6, max_path_props=6,
                      resources_per_domain=6)
    result = run_oracle_on_fixture(fx, cfg, max_rounds=20)
    statuses = {e.status for e in result.trace}
    assert "done" in statuses
    assert "error:mime" in statuses
    # chains of depth 6 exceed maxRedirects=5
    assert "error:too_many_redirects" in statuses
    # at least one resolved chain contributed triples attributed to the
    # ORIGINAL url (alt pages never appear as triple sources)
    for _k, v in result.triples.items():
        assert all("/alt/" not in s for s in v["sources"])


def test_oracle_respects_max_redirects_config():
    fx = _fixture_with_alts()
    lo = run_oracle_on_fixture(
        fx, CrawlConfig(max_path_length=3, resources_per_domain=3,
                        max_redirects=0), max_rounds=8)
    hi = run_oracle_on_fixture(
        fx, CrawlConfig(max_path_length=3, resources_per_domain=3,
                        max_redirects=5), max_rounds=8)
    lo_status = {e.status for e in lo.trace}
    assert "error:too_many_redirects" in lo_status
    n_done_lo = sum(1 for e in lo.trace if e.status == "done")
    n_done_hi = sum(1 for e in hi.trace if e.status == "done")
    assert n_done_hi > n_done_lo


# ---------------------------------------------------------------------------
# end-to-end: engine must match the oracle bit-for-bit with redirects on
# ---------------------------------------------------------------------------

def test_redirect_crawl_match(spark):
    fx = _fixture_with_alts()
    cfg = CrawlConfig(max_path_length=6, max_path_props=6,
                      resources_per_domain=6)
    oracle, engine = run_both(spark, fx, cfg, max_rounds=12)
    statuses = {e.status for e in oracle.trace}
    assert {"error:mime", "error:too_many_redirects"} <= statuses
    assert_match(oracle, engine)


def test_redirect_crawl_match_endpoint_mode(spark):
    fx = _fixture_with_alts()
    cfg = CrawlConfig(max_path_length=4, max_path_props=3,
                      resources_per_domain=3, path_type="endpoint")
    oracle, engine = run_both(spark, fx, cfg, max_rounds=8)
    assert_match(oracle, engine)
