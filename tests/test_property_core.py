"""Property-based tests (hypothesis) for the pure scalar functions —
the reference's unit strategy (SURVEY.md §5) extended with randomized
inputs: total functions never crash on garbage, canonicalization is
idempotent, the N-Triples escape/parse pair roundtrips, and the robots
matcher is deterministic and total. Pure-Python only (no Spark session)
so the examples run in milliseconds; the Arrow UDFs are thin wrappers
over these exact functions (functions/udfs.py) and their parity is
covered by the engine trace suites."""

import string

from hypothesis import given, settings, strategies as st

from derzis_spark.functions import core

# printable-ish unicode plus the separators/escapes that stress parsers
_text = st.text(
    alphabet=st.one_of(
        st.characters(codec="utf-8",
                      exclude_categories=("Cs",)),
        st.sampled_from('"\\\n\r\t <>{}#%/:?&=')),
    max_size=80)

_urlish = st.one_of(
    _text,
    st.builds(
        lambda h, p, q: f"http://{h}/{p}?{q}",
        st.text(alphabet=string.ascii_lowercase + ".-", min_size=1,
                max_size=20),
        st.text(alphabet=string.ascii_letters + "/.%~$&+,;=:@!'()*",
                max_size=30),
        st.text(alphabet=string.printable.strip(), max_size=15)),
)


@settings(max_examples=300, deadline=None)
@given(_urlish)
def test_canonicalize_total_and_idempotent(u):
    c = core.canonicalize_url(u)
    assert c is None or isinstance(c, str)
    if c is not None:
        # canonical form is a fixed point
        assert core.canonicalize_url(c) == c
        # and has a well-formed origin
        o = core.url_origin(c)
        assert o and c.startswith(o)


@settings(max_examples=300, deadline=None)
@given(_text)
def test_nt_escape_parse_roundtrip(s):
    line = (f'<http://example.org/s> <http://example.org/p> '
            f'"{core.nt_escape(s)}" .')
    triples = core.parse_ntriples(line)
    assert len(triples) == 1
    t = triples[0]
    assert t.object_kind == "literal"
    assert t.object_value == s


@settings(max_examples=300, deadline=None)
@given(_text)
def test_parse_ntriples_total_on_garbage(block):
    # any input: no crash, and every parsed triple is structurally valid
    for t in core.parse_ntriples(block):
        assert t.subject
        assert t.predicate
        assert t.object_kind in ("uri", "literal", "blank")


@settings(max_examples=200, deadline=None)
@given(_text, st.sampled_from(["derzis-spark", "*", "bot"]))
def test_robots_total_and_deterministic(txt, agent):
    r1 = core.parse_robots(txt, agent)
    r2 = core.parse_robots(txt, agent)
    assert r1 == r2
    url = "http://example.org/a/b?q=1"
    assert core.robots_allows_rules(r1, url) in (True, False)
    d = core.robots_crawl_delay(txt, agent)
    assert d is None or d >= 0


#: parser-shaped blank ids: parse_ntriples always yields "_:"-prefixed
#: tokens, which make_blank_node_id strips — generate in that domain
#: (an unprefixed "x" would alias "_:x" by design, and never occurs)
_blank_id = st.text(max_size=40).map(lambda s: "_:" + s)


@settings(max_examples=200, deadline=None)
@given(_blank_id, _blank_id)
def test_blank_node_namespacing_injective_per_source(a, b):
    # same source: distinct local ids never collide
    if a != b:
        assert (core.make_blank_node_id("http://x.org/p", a)
                != core.make_blank_node_id("http://x.org/p", b))


@settings(max_examples=300, deadline=None)
@given(_urlish)
def test_canonicalize_with_origin_matches_pair(u):
    # the fused one-parse discovery kernel must agree exactly with the
    # two single-value functions it replaces (functions/core.py)
    co = core.canonicalize_with_origin(u)
    cu = core.canonicalize_url(u)
    if cu is None:
        assert co is None
    else:
        assert co == (cu, core.url_origin(u))


# ---------------------------------------------------------------------------
# vectorized robots matcher ≡ scalar matcher (differential)
# ---------------------------------------------------------------------------

_robots_line = st.one_of(
    st.builds(lambda a: f"User-agent: {a}",
              st.sampled_from(["*", "derzis-spark", "derzis", "bot"])),
    st.builds(lambda p: f"Disallow: /{p}",
              st.text(alphabet=string.ascii_lowercase + "/*$.", max_size=10)),
    st.builds(lambda p: f"Allow: /{p}",
              st.text(alphabet=string.ascii_lowercase + "/*$.", max_size=10)),
    st.builds(lambda d: f"Crawl-delay: {d}", st.integers(0, 9)),
    _text,  # garbage lines must not desync the two matchers either
)
_robots_doc = st.one_of(
    st.none(),
    st.lists(_robots_line, max_size=10).map("\n".join))
_robots_url = st.builds(
    lambda p, q: f"http://example.org/{p}" + (f"?{q}" if q else ""),
    st.text(alphabet=string.ascii_lowercase + "/.%~*$&+,;=:@", max_size=25),
    st.text(alphabet=string.ascii_lowercase + "=&", max_size=10))


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(_robots_doc, _robots_url),
                min_size=1, max_size=25))
def test_vectorized_robots_matches_scalar(pairs):
    """The schedule's fused robots gate (functions/udfs.py
    make_robots_allows) parses each DISTINCT robots.txt once per Arrow
    batch via pandas factorize and decides per group. That plumbing
    (None→sentinel group, NaN coercion, index alignment across masks)
    must be invisible: for any batch of (robots_txt, url) pairs the
    vectorized answer equals the scalar core.robots_allows per row —
    including duplicate texts, None, empty docs, and garbage lines."""
    import pandas as pd

    from derzis_spark.functions import udfs

    agent = "derzis-spark"
    txts = pd.Series([t for t, _ in pairs], dtype=object)
    urls = pd.Series([u for _, u in pairs], dtype=object)
    vec = udfs.make_robots_allows(agent).func(txts, urls)
    for i, (t, u) in enumerate(pairs):
        assert bool(vec.iloc[i]) == core.robots_allows(t, u, agent), (
            f"row {i}: txt={t!r} url={u!r}")
