"""Unit tests for the pure scalar cores (parity with reference semantics)."""

from derzis_spark.functions.core import (
    Triple,
    canonicalize_url,
    extract_ntriples_block,
    extract_text,
    filter_quads,
    is_blank_node_id,
    make_blank_node_id,
    matches_predicate_pattern,
    nt_escape,
    parse_ntriples,
    parse_robots,
    robots_allows,
    robots_crawl_delay,
    url_origin,
)


class TestCanonicalizeUrl:
    def test_lowercases_scheme_host(self):
        assert canonicalize_url("HTTP://Example.ORG/Path") == \
            "http://example.org/Path"

    def test_strips_default_ports(self):
        assert canonicalize_url("http://a.org:80/x") == "http://a.org/x"
        assert canonicalize_url("https://a.org:443/x") == "https://a.org/x"
        assert canonicalize_url("https://a.org:8443/x") == "https://a.org:8443/x"

    def test_empty_path(self):
        assert canonicalize_url("http://a.org") == "http://a.org/"

    def test_strips_fragment_keeps_query(self):
        assert canonicalize_url("http://a.org/p?q=1#frag") == "http://a.org/p?q=1"

    def test_dot_segments(self):
        assert canonicalize_url("http://a.org/a/./b/../c") == "http://a.org/a/c"

    def test_rejects_non_http(self):
        assert canonicalize_url("ftp://a.org/x") is None
        assert canonicalize_url("mailto:x@y.z") is None
        assert canonicalize_url("not a url") is None
        assert canonicalize_url(None) is None
        assert canonicalize_url("") is None

    def test_idempotent(self):
        u = canonicalize_url("HTTP://A.org:80/a/../b?x=1#f")
        assert canonicalize_url(u) == u

    def test_origin(self):
        assert url_origin("HTTP://A.org:80/deep/path?x") == "http://a.org"
        assert url_origin("https://a.org:8443/x") == "https://a.org:8443"
        assert url_origin("junk") is None


class TestBlankNodes:
    def test_is_blank(self):
        # reference: common/src/lib/mongoose-validators.test.ts:4-19
        assert is_blank_node_id("_:b1")
        assert not is_blank_node_id("_:")
        assert not is_blank_node_id("http://x.org/")
        assert not is_blank_node_id(None)

    def test_namespacing(self):
        # reference: worker/src/lib/makeBlankNodeId.test.ts:4-24
        assert make_blank_node_id("http://a.org/p", "_:b1") == \
            "_:http://a.org/p:b1"
        assert make_blank_node_id("http://a.org/p", "b1") == \
            "_:http://a.org/p:b1"


class TestNTriples:
    def test_uri_triple(self):
        ts = parse_ntriples("<http://a/s> <http://a/p> <http://a/o> .")
        assert ts == [Triple("http://a/s", "http://a/p", "uri", "http://a/o")]

    def test_literal_lang_datatype(self):
        ts = parse_ntriples(
            '<http://a/s> <http://a/p> "hi"@en .\n'
            '<http://a/s> <http://a/p> "5"^^<http://www.w3.org/2001/XMLSchema#int> .\n'
            '<http://a/s> <http://a/p> "plain" .'
        )
        assert ts[0].object_language == "en" and ts[0].object_value == "hi"
        assert ts[1].object_datatype == "http://www.w3.org/2001/XMLSchema#int"
        assert ts[2] == Triple("http://a/s", "http://a/p", "literal", "plain")

    def test_blank_nodes_and_escapes(self):
        ts = parse_ntriples(
            '_:b1 <http://a/p> <http://a/o> .\n'
            '<http://a/s> <http://a/p> _:b2 .\n'
            '<http://a/s> <http://a/p> "a\\"b\\nc" .'
        )
        assert ts[0].subject == "_:b1"
        assert ts[1].object_kind == "blank" and ts[1].object_value == "_:b2"
        assert ts[2].object_value == 'a"b\nc'

    def test_skips_garbage(self):
        assert parse_ntriples("not a triple\n# comment\n\n") == []

    def test_escape_roundtrip(self):
        v = 'a"b\\c\nd\te'
        ts = parse_ntriples(f'<http://a/s> <http://a/p> "{nt_escape(v)}" .')
        assert ts[0].object_value == v


class TestQuadFilter:
    # reference rules: worker/src/lib/Worker.ts:599-657
    def test_drops_blank_when_disallowed(self):
        ts = [Triple("_:b1", "http://a/p", "uri", "http://a/o"),
              Triple("http://a/s", "http://a/p", "blank", "_:b2")]
        assert filter_quads(ts, "http://src", False) == []

    def test_namespaces_blank_when_allowed(self):
        ts = [Triple("http://a/s", "http://a/p", "blank", "_:b2")]
        out = filter_quads(ts, "http://src", True)
        assert out[0].object_value == "_:http://src:b2"

    def test_drops_empty_literal(self):
        ts = [Triple("http://a/s", "http://a/p", "literal", "")]
        assert filter_quads(ts, "http://src", False) == []


class TestExtract:
    def test_extract_text_byte_identical(self):
        html = b"<html><body><text>ola \xc3\xa9 mundo</text><ntriples></ntriples></body></html>"
        assert extract_text(html) == "ola é mundo"

    def test_extract_block(self):
        html = b"<html><text>t</text><ntriples><http://a/s> <http://a/p> <http://a/o> .</ntriples></html>"
        assert len(parse_ntriples(extract_ntriples_block(html))) == 1


ROBOTS = """# comment
User-agent: *
Disallow: /private/
Allow: /private/open
Crawl-delay: 3

User-agent: derzis
Disallow: /secret/
Crawl-delay: 7
"""


class TestRobots:
    def test_group_selection_specific(self):
        r = parse_robots(ROBOTS, "derzis-spark")
        assert r.crawl_delay == 7
        assert r.disallows == ("/secret/",)

    def test_group_fallback_star(self):
        r = parse_robots(ROBOTS, "otherbot")
        assert r.crawl_delay == 3

    def test_allow_overrides_longer(self):
        txt = "User-agent: *\nDisallow: /private/\nAllow: /private/open\n"
        assert not robots_allows(txt, "http://a.org/private/x", "bot")
        assert robots_allows(txt, "http://a.org/private/open/y", "bot")
        assert robots_allows(txt, "http://a.org/public", "bot")

    def test_empty_disallow_allows_all(self):
        assert robots_allows("User-agent: *\nDisallow:\n", "http://a.org/x", "b")

    def test_empty_robots_allows(self):
        assert robots_allows("", "http://a.org/x", "b")
        assert robots_allows(None, "http://a.org/x", "b")
        assert robots_crawl_delay(None, "b") is None

    def test_wildcard_and_anchor(self):
        txt = "User-agent: *\nDisallow: /*.pdf$\n"
        assert not robots_allows(txt, "http://a.org/doc.pdf", "b")
        assert robots_allows(txt, "http://a.org/doc.pdfx", "b")


class TestPredPattern:
    # reference: models/src/Process/process-utils.ts:1-34
    def test_regex(self):
        assert matches_predicate_pattern("/lab.l/", "http://x/rdfs#label")

    def test_prefix(self):
        assert matches_predicate_pattern("http://x/", "http://x/p1")
        assert not matches_predicate_pattern("http://x/p2", "http://x/p1")

    def test_substring(self):
        assert matches_predicate_pattern("label", "http://x/rdfs#label")
