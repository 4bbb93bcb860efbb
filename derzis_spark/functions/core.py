"""Pure-Python scalar cores (no Spark imports).

Semantics mirror the reference crawler:

- URL canonicalization / origin: WHATWG ``new URL(u).origin`` semantics
  (lowercase scheme+host, default-port elision) + RFC 3986 path
  normalization; pervasive in the reference
  (models/src/Resource.ts:159,318-326; models/src/Domain.ts:959).
- blank-node id namespacing ``_:{source}:{local}``
  (worker/src/lib/Worker.ts:63-70).
- N-Triples subset parser + quad validity filter
  (worker/src/lib/parse-rdf.ts:11-26; Worker.ts:599-657).
- robots.txt parsing: allow/disallow longest-match + Crawl-delay
  (robots-parser lib used at worker/src/lib/Worker.ts:415-423;
  crawl-delay override manager/src/lib/Manager.ts:454-465).
- byte-identical text extraction per url (BASELINE.json input_hint).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache
from urllib.parse import urlsplit, quote, unquote

# --------------------------------------------------------------------------
# URL canonicalization
# --------------------------------------------------------------------------

_DEFAULT_PORTS = {"http": 80, "https": 443}
_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*$")


def _normalize_path(path: str) -> str:
    """RFC 3986 §5.2.4 remove-dot-segments + percent renormalization."""
    if not path:
        return "/"
    segs: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if segs:
                segs.pop()
            continue
        segs.append(seg)
    # keep a trailing slash if the original ended with one or ./..
    if path.endswith((".", "..")) or path.endswith("/"):
        if not segs or segs[-1] != "":
            segs.append("")
    out = "/".join(segs)
    if not out.startswith("/"):
        out = "/" + out
    # percent-encoding: decode unreserved, re-encode the rest uppercase
    return quote(unquote(out), safe="/:@!$&'()*+,;=~-._")


def canonicalize_url(url: str | None) -> str | None:
    """Canonical URL or None if invalid.

    Rules: http(s) only; lowercase scheme+host; strip default port;
    strip fragment; normalize dot-segments and percent-encoding; empty
    path → ``/``. Matches the validity gate of
    common/src/lib/url.ts:1-8 (http/https URLs only).
    """
    if not url or not isinstance(url, str):
        return None
    url = url.strip()
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if port is not None and port != _DEFAULT_PORTS[scheme]:
        netloc = f"{host}:{port}"
    path = _normalize_path(parts.path)
    query = f"?{parts.query}" if parts.query else ""
    return f"{scheme}://{netloc}{path}{query}"


def url_origin(url: str | None) -> str | None:
    """WHATWG ``new URL(u).origin``: scheme://host[:non-default-port]."""
    cu = canonicalize_url(url)
    if cu is None:
        return None
    parts = urlsplit(cu)
    return f"{parts.scheme}://{parts.netloc}"


def canonicalize_with_origin(url: str | None) -> tuple[str, str] | None:
    """One-parse ``(canonicalize_url(u), url_origin(u))`` pair (or None
    if invalid). The canonical form is ``scheme://netloc`` + a path
    that always starts with ``/``, so the origin is the prefix up to
    the first ``/`` after ``://`` — no second urlsplit. Equality with
    the two single-value functions is property-tested
    (tests/test_property_core.py)."""
    cu = canonicalize_url(url)
    if cu is None:
        return None
    return cu, cu[: cu.index("/", cu.index("://") + 3)]


def is_blank_node_id(value: str | None) -> bool:
    """Reference: common/src/lib/mongoose-validators.ts (startswith '_:', len>2)."""
    return isinstance(value, str) and value.startswith("_:") and len(value) > 2


def make_blank_node_id(source_url: str, local_id: str) -> str:
    """Namespace a blank-node id by source page (Worker.ts:63-70)."""
    local = local_id[2:] if local_id.startswith("_:") else local_id
    return f"_:{source_url}:{local}"


# --------------------------------------------------------------------------
# Text extraction (byte-identical per url vs the fixture ground truth)
# --------------------------------------------------------------------------

_TEXT_RE = re.compile(rb"<text>(.*?)</text>", re.DOTALL)


def extract_text(html: bytes | None) -> str | None:
    """Extract the ground-truth text block from a fixture page body.

    The fixture generator embeds the document text between ``<text>``
    markers; extraction must reproduce the ``text`` column
    byte-identically (BASELINE.json input_hint). Analog of the
    reference's body handling in worker/src/lib/Worker.ts:566-598.
    """
    if html is None:
        return None
    m = _TEXT_RE.search(html)
    if m is None:
        return ""
    return m.group(1).decode("utf-8")


# --------------------------------------------------------------------------
# N-Triples subset parser (the RDF extraction hot loop)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class Triple:
    subject: str
    predicate: str
    object_kind: str  # uri | literal | blank
    object_value: str
    object_datatype: str | None = None
    object_language: str | None = None

    def object_key(self) -> str:
        """Literal identity key value|datatype|language
        (reference: models/src/Path/TraversalPath.ts:368)."""
        if self.object_kind == "literal":
            return "|".join(
                [self.object_value, self.object_datatype or "",
                 self.object_language or ""]
            )
        return self.object_value


_NT_LINE_RE = re.compile(
    r"""^\s*
        (?P<s><[^>]*>|_:\S+)\s+
        (?P<p><[^>]*>)\s+
        (?P<o><[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?)
        \s*\.\s*$""",
    re.VERBOSE,
)

_NT_ESCAPES = {
    "\\n": "\n", "\\r": "\r", "\\t": "\t", '\\"': '"', "\\\\": "\\",
}
_NT_UNESCAPE_RE = re.compile(r"\\[nrt\"\\]")


def _nt_unescape(s: str) -> str:
    return _NT_UNESCAPE_RE.sub(lambda m: _NT_ESCAPES[m.group(0)], s)


def nt_escape(s: str) -> str:
    """Escape a literal value for N-Triples serialization (export sink,
    reference: manager/.../triples.nt.gz/+server.ts:14-93)."""
    return (
        s.replace("\\", "\\\\").replace('"', '\\"')
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    )


def parse_ntriples(block: str | None) -> list[Triple]:
    """Parse an N-Triples block into raw triples (no filtering).

    Subset: IRIs ``<...>``, blank nodes ``_:id``, literals with optional
    ``@lang`` / ``^^<datatype>``. Analog of stream RDF parsing at
    worker/src/lib/parse-rdf.ts:11-26. Unparseable lines are skipped
    (the reference collects parse errors and continues).
    """
    if not block:
        return []
    out: list[Triple] = []
    for line in block.split("\n"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _NT_LINE_RE.match(line)
        if m is None:
            continue
        s_raw, p_raw, o_raw = m.group("s"), m.group("p"), m.group("o")
        subject = s_raw[1:-1] if s_raw.startswith("<") else s_raw
        predicate = p_raw[1:-1]
        if o_raw.startswith("<"):
            out.append(Triple(subject, predicate, "uri", o_raw[1:-1]))
        elif o_raw.startswith("_:"):
            out.append(Triple(subject, predicate, "blank", o_raw))
        else:
            # literal
            lang = None
            dtype = None
            if o_raw.endswith(">") and "^^<" in o_raw:
                body, _, dt = o_raw.rpartition("^^<")
                dtype = dt[:-1]
            else:
                body = o_raw
                at = re.search(r'"@([A-Za-z0-9-]+)$', o_raw)
                if at:
                    lang = at.group(1)
                    body = o_raw[: at.start() + 1]
            value = _nt_unescape(body[1:-1])
            out.append(Triple(subject, predicate, "literal", value, dtype, lang))
    return out


def filter_quads(
    triples: list[Triple], source_url: str, allow_blank_nodes: bool
) -> list[Triple]:
    """Quad validity filter (Worker.ts:599-657):

    - subject and predicate must be named nodes (blank subjects only if
      ``allow_blank_nodes``, in which case they are namespaced);
    - object may be uri or non-empty literal; blank objects only if
      allowed (namespaced, Worker.ts:63-70);
    - empty literal object values are dropped (Worker.ts:647-657).
    """
    out: list[Triple] = []
    for t in triples:
        subject = t.subject
        if is_blank_node_id(subject):
            if not allow_blank_nodes:
                continue
            subject = make_blank_node_id(source_url, subject)
        if t.object_kind == "blank":
            if not allow_blank_nodes:
                continue
            out.append(
                Triple(subject, t.predicate, "blank",
                       make_blank_node_id(source_url, t.object_value))
            )
        elif t.object_kind == "literal":
            if t.object_value == "":
                continue
            out.append(Triple(subject, t.predicate, "literal",
                              t.object_value, t.object_datatype,
                              t.object_language))
        else:
            if t.object_value == "":
                continue
            out.append(Triple(subject, t.predicate, "uri", t.object_value))
    return out


_NT_BLOCK_RE = re.compile(rb"<ntriples>(.*?)</ntriples>", re.DOTALL)


def extract_ntriples_block(html: bytes | None) -> str:
    """Pull the embedded N-Triples payload out of a fixture page body."""
    if html is None:
        return ""
    m = _NT_BLOCK_RE.search(html)
    if m is None:
        return ""
    return m.group(1).decode("utf-8")


# --------------------------------------------------------------------------
# alternate-URL redirect discovery (wrong-MIME fallback)
# --------------------------------------------------------------------------

#: accepted RDF MIME types, in the reference's priority order
#: (config/src/index.ts:96-104; findUrlInHtml iterates them in order,
#: worker/src/lib/worker-utils.ts:146-158)
ACCEPTED_RDF_MIMES = (
    "text/turtle",
    "application/trig",
    "application/n-quads",
    "application/n-triples",
    "text/n3",
    "application/ld+json",
    "application/rdf+xml",
)

_LINK_TAG_RE = re.compile(rb"<link\b[^>]*>", re.IGNORECASE)
_LINK_ATTR_RE = re.compile(rb'([a-zA-Z-]+)\s*=\s*"([^"]*)"')


def has_rdf_content(html: bytes | None) -> bool:
    """True when the page body carries an RDF payload the parser accepts.

    In the reference the equivalent signal is the response's
    Content-Type being one of the accepted RDF MIMEs
    (worker/src/lib/Worker.ts:744-750); the pages-table substitute has
    no HTTP headers, so "accepted MIME" ≡ an embedded N-Triples block.
    """
    return html is not None and _NT_BLOCK_RE.search(html) is not None


def find_alternate_url(html: bytes | None) -> str | None:
    """Find an RDF alternate link in an HTML body.

    Mirrors ``findUrlInHtml`` (worker/src/lib/worker-utils.ts:146-160):
    for each accepted MIME *in priority order*, return the href of the
    first ``<link rel="alternate" type="<mime>">`` tag in document
    order. Attribute order inside the tag is free (cheerio parity).
    The Link-header branch (worker-utils.ts:127-133) has no analog here
    because the pages table carries no HTTP headers.
    """
    if html is None:
        return None
    links: list[dict[bytes, bytes]] = []
    for tag in _LINK_TAG_RE.finditer(html):
        attrs = {
            k.lower(): v for k, v in _LINK_ATTR_RE.findall(tag.group(0))
        }
        if attrs.get(b"rel", b"").lower() == b"alternate":
            links.append(attrs)
    for mime in ACCEPTED_RDF_MIMES:
        for attrs in links:
            if attrs.get(b"type", b"").decode("utf-8", "replace") == mime:
                href = attrs.get(b"href")
                if href:
                    return href.decode("utf-8", "replace")
    return None


# --------------------------------------------------------------------------
# robots.txt
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class RobotsRules:
    """Parsed rules for one user-agent group."""
    allows: tuple[str, ...]
    disallows: tuple[str, ...]
    crawl_delay: float | None


def parse_robots(robots_txt: str | None, user_agent: str) -> RobotsRules:
    """Parse robots.txt for ``user_agent``.

    Group selection: most-specific UA token that is a case-insensitive
    substring match of ``user_agent`` (longest token wins), ``*`` as
    fallback — matching the robots-parser npm library the reference
    uses (worker/src/lib/Worker.ts:415-423).
    """
    if not robots_txt:
        return RobotsRules((), (), None)
    ua = user_agent.lower()
    groups: dict[str, dict] = {}
    current: list[str] = []
    last_was_ua = False
    for raw in robots_txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            token = val.lower()
            if not last_was_ua:
                current = []
            current.append(token)
            groups.setdefault(token, {"allow": [], "disallow": [], "delay": None})
            last_was_ua = True
            continue
        last_was_ua = False
        for token in current:
            g = groups.get(token)
            if g is None:
                continue
            if key == "allow" and val:
                g["allow"].append(val)
            elif key == "disallow":
                if val:
                    g["disallow"].append(val)
            elif key == "crawl-delay":
                try:
                    g["delay"] = float(val)
                except ValueError:
                    pass
    # pick the most specific matching group
    best: str | None = None
    for token in groups:
        if token != "*" and token in ua:
            if best is None or len(token) > len(best):
                best = token
    if best is None and "*" in groups:
        best = "*"
    if best is None:
        return RobotsRules((), (), None)
    g = groups[best]
    return RobotsRules(tuple(g["allow"]), tuple(g["disallow"]), g["delay"])


@lru_cache(maxsize=8192)
def _rule_regex(rule: str):
    """Compiled matcher for one allow/disallow rule (cached — robots
    rules repeat across every URL of a domain)."""
    anchored = rule.endswith("$")
    pattern = rule[:-1] if anchored else rule
    regex = ".*".join(re.escape(part) for part in pattern.split("*"))
    return re.compile("^" + regex + ("$" if anchored else ""))


def _rule_matches(rule: str, path: str) -> int:
    """Return match length if ``rule`` matches ``path`` else -1.

    Supports ``*`` wildcards and ``$`` end anchor (Google extension,
    supported by the robots-parser lib)."""
    return len(rule) if _rule_regex(rule).match(path) else -1


def robots_allows_rules(rules: RobotsRules, url: str) -> bool:
    """Longest-match allow/disallow decision against PRE-PARSED rules;
    allow wins ties. Split from ``robots_allows`` so batch callers
    parse each distinct robots.txt once."""
    parts = urlsplit(url)
    path = parts.path or "/"
    if parts.query:
        path += "?" + parts.query
    best_allow = max((_rule_matches(r, path) for r in rules.allows), default=-1)
    best_dis = max((_rule_matches(r, path) for r in rules.disallows), default=-1)
    if best_dis == -1:
        return True
    if best_allow >= best_dis:
        return True
    return False


def robots_allows(robots_txt: str | None, url: str, user_agent: str) -> bool:
    """Longest-match allow/disallow decision; allow wins ties."""
    return robots_allows_rules(parse_robots(robots_txt, user_agent), url)


def robots_crawl_delay(robots_txt: str | None, user_agent: str) -> float | None:
    return parse_robots(robots_txt, user_agent).crawl_delay


# --------------------------------------------------------------------------
# predicate-limitation pattern matching (process-utils.ts:1-34)
# --------------------------------------------------------------------------

def matches_predicate_pattern(pattern: str, predicate: str) -> bool:
    """``/re/`` → regex search; ``http…`` → prefix; else substring."""
    if len(pattern) > 1 and pattern.startswith("/") and pattern.endswith("/"):
        return re.search(pattern[1:-1], predicate) is not None
    if pattern.startswith(("http://", "https://")):
        return predicate.startswith(pattern)
    return pattern in predicate
