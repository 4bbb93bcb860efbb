"""Deterministic synthetic crawl fixture generator (seeded, no network).

Produces the input-table contract of BASELINE.json (`input_hint`):
``pages(url, warc_ts, html binary, text, lang)`` plus ``robots(origin,
status, robots_txt)`` and ``seeds(url)`` — the sandbox substitute for
live HTTP fetching (reference fetch: worker/src/lib/Worker.ts:697-728;
robots fetch: worker/src/lib/worker-utils.ts:96-116).

Generator properties (FIXTURES.md):
- origins follow a Zipf-like skew with one mega-domain (exercises the
  salted-partition / per-domain top-k path);
- the embedded link graph has diameter > max_path_length so bounds bind;
- some linked URLs have no pages row (host/resource-not-found errors);
- robots.txt mix: allow-all, Crawl-delay overrides, Disallow rules that
  hit real pages, 404s, and one host-not-found origin;
- literal triples with language tags (drives label-language preference,
  manager/src/lib/Manager.ts:418-448) and blank-node triples (gated by
  allow_blank_nodes).

Everything is a pure function of (seed, scale) — bit-stable across runs.
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass, field

from derzis_spark.functions.core import Triple, nt_escape

RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDFS_COMMENT = "http://www.w3.org/2000/01/rdf-schema#comment"
PRED_NS = "http://example.org/pred/"

_WORDS = (
    "spark crawl frontier queue domain robots delay path predicate node "
    "triple graph seed fetch parse extract merge snapshot round bloom "
    "cuckoo filter shuffle partition skew salt broadcast join window"
).split()

_LANGS = ("en", "en", "en", "pt", "de", "")


@dataclass
class CrawlFixture:
    # pages columns
    urls: list[str] = field(default_factory=list)
    warc_ts: list[dt.datetime] = field(default_factory=list)
    html: list[bytes] = field(default_factory=list)
    text: list[str] = field(default_factory=list)
    lang: list[str] = field(default_factory=list)
    # robots columns
    robots_origin: list[str] = field(default_factory=list)
    robots_status: list[str] = field(default_factory=list)
    robots_txt: list[str] = field(default_factory=list)
    # seeds
    seeds: list[str] = field(default_factory=list)

    def pages_rows(self) -> list[tuple]:
        return list(zip(self.urls, self.warc_ts, self.html, self.text, self.lang))

    def robots_rows(self) -> list[tuple]:
        return list(zip(self.robots_origin, self.robots_status, self.robots_txt))


def _zipf_weights(n: int, s: float = 1.2) -> list[float]:
    return [1.0 / (i + 1) ** s for i in range(n)]


def _page_html(text: str, triples: list[Triple]) -> bytes:
    lines = []
    for t in triples:
        if t.object_kind == "uri":
            obj = f"<{t.object_value}>"
        elif t.object_kind == "blank":
            obj = t.object_value
        else:
            obj = f'"{nt_escape(t.object_value)}"'
            if t.object_language:
                obj += f"@{t.object_language}"
            elif t.object_datatype:
                obj += f"^^<{t.object_datatype}>"
        subj = t.subject if t.subject.startswith("_:") else f"<{t.subject}>"
        lines.append(f"{subj} <{t.predicate}> {obj} .")
    nt = "\n".join(lines)
    return (
        b"<html><head><meta charset=\"utf-8\"></head><body><text>"
        + text.encode("utf-8")
        + b"</text><ntriples>"
        + nt.encode("utf-8")
        + b"</ntriples></body></html>"
    )


def _redirect_page_html(text: str, alt_href: str | None) -> bytes:
    """An HTML-only page body (no N-Triples payload = wrong MIME in the
    reference's terms, Worker.ts:744-750), optionally carrying an RDF
    alternate link (worker-utils.ts:146-160)."""
    link = (
        f'<link rel="alternate" type="application/n-triples" '
        f'href="{alt_href}">'
        if alt_href
        else ""
    )
    return (
        b"<html><head><meta charset=\"utf-8\">"
        + link.encode("utf-8")
        + b"</head><body><text>"
        + text.encode("utf-8")
        + b"</text></body></html>"
    )


def generate_fixture(
    n_pages: int = 400,
    n_origins: int = 12,
    n_seeds: int = 6,
    seed: int = 42,
    out_links: int = 3,
    ghost_rate: float = 0.05,
    literal_rate: float = 0.5,
    blank_rate: float = 0.1,
    text_words: tuple = (8, 40),
    min_links: int = 1,
    alt_rate: float = 0.0,
    blank_subject_rate: float = 0.0,
) -> CrawlFixture:
    """``alt_rate`` > 0 converts that fraction of pages into HTML-only
    pages whose RDF payload lives behind an alternate-link chain
    (Worker.ts:744-766): depth-1/2/3 chains that resolve, a depth-6
    chain (> maxRedirects 5 → too-many-redirects), a chain ending at a
    missing page (not_found), and a linkless HTML page (MIME error).
    Default 0.0 keeps the fixture byte-identical to earlier rounds."""
    rng = random.Random(seed)
    fx = CrawlFixture()

    origins = [f"https://o{i}.example.org" for i in range(n_origins)]
    weights = _zipf_weights(n_origins)

    # assign pages to origins with Zipf skew (origin 0 = mega-domain)
    page_origin = rng.choices(range(n_origins), weights=weights, k=n_pages)
    urls = []
    for j in range(n_pages):
        o = page_origin[j]
        # a slice of the mega-domain lives under /private/ (robots-disallowed)
        priv = "private/" if (o == 0 and j % 7 == 3) else ""
        urls.append(f"{origins[o]}/{priv}page/{j}")
    url_set = set(urls)

    # ghost URLs: linked but absent from pages (fetch → not_found)
    n_ghosts = max(1, int(n_pages * ghost_rate))
    ghosts = [
        f"{origins[rng.randrange(n_origins)]}/ghost/{g}" for g in range(n_ghosts)
    ]

    n_preds = 8
    preds = [f"{PRED_NS}p{i}" for i in range(n_preds)]

    base_ts = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    page_triples: list[list[Triple]] = []

    for j, url in enumerate(urls):
        n_words = rng.randint(*text_words)
        if n_words <= 64:
            text = " ".join(rng.choices(_WORDS, k=n_words))
        else:
            # big pages (scaling fixtures): tile a random 64-word chunk
            # — same determinism, O(1) RNG draws per page
            chunk = rng.choices(_WORDS, k=64)
            reps = -(-n_words // 64)
            text = " ".join((chunk * reps)[:n_words])
        lang = rng.choice(_LANGS)
        triples: list[Triple] = []
        # outlinks as uri triples
        k = rng.randint(min(min_links, out_links), out_links)
        for _ in range(k):
            if ghosts and rng.random() < 0.1:
                target = rng.choice(ghosts)
            else:
                target = urls[rng.randrange(n_pages)]
            triples.append(Triple(url, rng.choice(preds), "uri", target))
        # literal triples (labels with languages + plain values)
        if rng.random() < literal_rate:
            p = rng.choice((RDFS_LABEL, RDFS_COMMENT, preds[0]))
            langtag = rng.choice(("en", "pt", None, None))
            triples.append(
                Triple(url, p, "literal", f"label {j}", None, langtag)
            )
        # occasionally an empty literal (must be dropped by the filter)
        if rng.random() < 0.05:
            triples.append(Triple(url, preds[1], "literal", ""))
        # blank-node triples (dropped unless allow_blank_nodes)
        if rng.random() < blank_rate:
            bid = f"_:b{j}"
            triples.append(Triple(url, preds[2], "blank", bid))
            # blank-SUBJECT triples give the blank node outgoing edges,
            # exercising real 2-hop chaining (blank-node-utils.ts:21-38,
            # EndpointPath.ts:270-337). Gated so the default fixture
            # stays byte-identical (the rng stream is untouched at 0.0).
            if blank_subject_rate and rng.random() < blank_subject_rate:
                triples.append(Triple(
                    bid, preds[4], "uri", urls[rng.randrange(n_pages)]))
                if rng.random() < 0.5:
                    triples.append(Triple(
                        bid, RDFS_LABEL, "literal", f"blabel {j}",
                        None, "en"))
        # self-loop occasionally (must be rejected by cycle filter)
        if rng.random() < 0.05:
            triples.append(Triple(url, preds[3], "uri", url))
        fx.urls.append(url)
        fx.warc_ts.append(base_ts + dt.timedelta(seconds=j))
        fx.html.append(_page_html(text, triples))
        fx.text.append(text)
        fx.lang.append(lang)
        if alt_rate:
            page_triples.append(triples)

    # alternate-link chains (separate RNG stream: alt_rate=0 fixtures
    # stay byte-identical to rounds generated before this feature)
    if alt_rate:
        arng = random.Random(seed ^ 0x5EED)
        conv = 0
        next_ts = n_pages
        for j in range(n_pages):
            if arng.random() >= alt_rate:
                continue
            url, origin = urls[j], origins[page_origin[j]]
            triples = page_triples[j]
            conv += 1
            case = conv % 10
            if case == 9:
                # linkless HTML page → MimeTypeError (Worker.ts:748-750)
                fx.html[j] = _redirect_page_html(fx.text[j], None)
                continue
            if case == 8:
                # alternate target absent from pages → not_found
                fx.html[j] = _redirect_page_html(
                    fx.text[j], f"{origin}/alt/{j}/missing")
                continue
            if case == 7:
                depth = 6  # > maxRedirects(5) → TooManyRedirectsError
            elif case == 6:
                depth = 3
            elif case in (4, 5):
                depth = 2
            else:
                depth = 1
            alt_urls = [f"{origin}/alt/{j}/{d}" for d in range(1, depth + 1)]
            fx.html[j] = _redirect_page_html(fx.text[j], alt_urls[0])
            for d, alt in enumerate(alt_urls):
                last = d == depth - 1
                fx.urls.append(alt)
                fx.warc_ts.append(base_ts + dt.timedelta(seconds=next_ts))
                next_ts += 1
                fx.html.append(
                    _page_html("", triples) if last
                    else _redirect_page_html("", alt_urls[d + 1]))
                fx.text.append("")
                fx.lang.append("")

    # robots per origin
    for i, origin in enumerate(origins):
        if i == n_origins - 1 and n_origins > 3:
            fx.robots_origin.append(origin)
            fx.robots_status.append("host_not_found")
            fx.robots_txt.append("")
        elif i % 5 == 4:
            fx.robots_origin.append(origin)
            fx.robots_status.append("not_found")
            fx.robots_txt.append("")
        else:
            body = ["User-agent: *"]
            if i == 0:
                body.append("Disallow: /private/")
            if i % 3 == 1:
                body.append("Crawl-delay: 2")
            body.append("Disallow:")
            fx.robots_origin.append(origin)
            fx.robots_status.append("ok")
            fx.robots_txt.append("\n".join(body))

    # seeds: n_seeds pages, ≥2 sharing an origin, all present in pages
    mega = [u for u in urls if u.startswith(origins[0]) and "/private/" not in u]
    seeds = [mega[0], mega[1]] if len(mega) >= 2 else urls[:2]
    step = max(1, n_pages // (n_seeds * 2 + 1))
    j = 2
    while len(seeds) < n_seeds and j * step < n_pages:
        cand = urls[j * step]
        if cand not in seeds and "/private/" not in cand:
            seeds.append(cand)
        j += 1
    fx.seeds = seeds[:n_seeds]
    assert all(s in url_set for s in fx.seeds)
    return fx


def write_fixture_parquet(fx: CrawlFixture, out_dir: str) -> None:
    """Write pages/robots/seeds as parquet via pyarrow (no Spark needed)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pages = pa.table(
        {
            "url": fx.urls,
            "warc_ts": pa.array(fx.warc_ts, type=pa.timestamp("us", tz="UTC")),
            "html": pa.array(fx.html, type=pa.binary()),
            "text": fx.text,
            "lang": fx.lang,
        }
    )
    # small row groups keep the single file splittable into many Spark
    # input partitions (one giant row group = one scan task)
    pq.write_table(pages, f"{out_dir}/pages.parquet", row_group_size=4096)
    robots = pa.table(
        {
            "origin": fx.robots_origin,
            "status": fx.robots_status,
            "robots_txt": fx.robots_txt,
        }
    )
    pq.write_table(robots, f"{out_dir}/robots.parquet")
    pq.write_table(pa.table({"url": fx.seeds}), f"{out_dir}/seeds.parquet")
