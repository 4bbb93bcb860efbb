"""Label-fetch secondary queue (Domain.labelsToFetch batching,
Worker.fetchDomainLabels, Manager.getLabelTriples/saveLabelFetch) —
the Spark operator must match a pure-python mirror of the reference
semantics on batching, statuses, and kept label triples."""

import pytest

from derzis_spark.config import LABEL_PREDICATES
from derzis_spark.fixtures import generate_fixture
from derzis_spark.functions.core import (
    extract_ntriples_block,
    parse_ntriples,
    robots_allows,
)
from derzis_spark.operators.label_fetch import (
    label_fetch_round,
    select_label_batch,
)


def _mirror_batch(rows, res_limit, dom_limit):
    """Pure mirror of select_label_batch (Domain.ts:610-731 restated)."""
    new = sorted((r for r in rows if r[3] == "new"), key=lambda r: r[2])
    per_dom: dict[str, list] = {}
    for d, u, seq, _st in new:
        per_dom.setdefault(d, [])
        if len(per_dom[d]) < res_limit:
            per_dom[d].append((u, seq))
    stats = []
    for d, urls in per_dom.items():
        full = len(urls) >= res_limit
        order_seq = urls[-1][1] if full else urls[0][1]
        stats.append((0 if full else 1, order_seq, d))
    stats.sort()
    chosen = [d for _t, _s, d in stats[:dom_limit]] if dom_limit \
        else [d for _t, _s, d in stats]
    return {(d, u, s) for d in chosen for (u, s) in per_dom[d]}


def _mirror_round(rows, fx, res_limit, dom_limit, ua="derzis-spark"):
    robots = {o: t for o, _s, t in
              zip(fx.robots_origin, fx.robots_status, fx.robots_txt)}
    pages = {u: h for u, h in zip(fx.urls, fx.html)}
    batch = _mirror_batch(rows, res_limit, dom_limit)
    statuses, triples = {}, set()
    for d, u, _s in batch:
        if not robots_allows(robots.get(d, ""), u, ua):
            statuses[u] = "error"
            continue
        html = pages.get(u)
        if html is None:
            statuses[u] = "error"
            continue
        statuses[u] = "done"
        by_subject: dict[str, list] = {}
        for t in parse_ntriples(extract_ntriples_block(html)):
            if (t.predicate in LABEL_PREDICATES
                    and t.object_kind == "literal" and t.object_value):
                by_subject.setdefault(t.subject, []).append(t)
        for subj, ts in by_subject.items():
            en = [t for t in ts if t.object_language == "en"]
            keep = en if en else [t for t in ts if t.object_language is None]
            for t in keep:
                triples.add((u, t.subject, t.predicate, t.object_value,
                             t.object_language))
    return batch, statuses, triples


def _label_rows(fx):
    """Deterministic labels table: every 2nd fixture page + one ghost
    per origin; created_seq interleaves domains so batching order is
    non-trivial."""
    rows = []
    seq = 0
    for i, u in enumerate(fx.urls):
        if i % 2 == 0 and "/alt/" not in u:
            origin = u.rsplit("/page/", 1)[0].rsplit("/private", 1)[0] \
                if "/page/" in u else u
            origin = u.split("/page/")[0].replace("/private", "") \
                if "/page/" in u else u
            rows.append((origin, u, seq, "new"))
            seq += 1
    for o in fx.robots_origin[:3]:
        rows.append((o, f"{o}/ghost/labels/{seq}", seq, "new"))
        seq += 1
    # a few already-done rows must be preserved untouched
    rows.append((fx.robots_origin[0], f"{fx.robots_origin[0]}/done/x",
                 seq, "done"))
    return rows


@pytest.fixture(scope="module")
def fx():
    return generate_fixture(n_pages=90, n_origins=6, n_seeds=4, seed=17,
                            literal_rate=0.9)


def _spark_tables(spark, fx, rows):
    from derzis_spark import schemas
    labels = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3]) for r in rows],
        "domain string, url string, created_seq long, status string")
    pages = spark.createDataFrame(fx.pages_rows(), schemas.PAGES)
    robots = spark.createDataFrame(fx.robots_rows(), schemas.ROBOTS)
    return labels, pages, robots


@pytest.mark.parametrize("res_limit,dom_limit", [(5, 3), (8, None), (3, 2)])
def test_batch_selection_matches_mirror(spark, fx, res_limit, dom_limit):
    rows = _label_rows(fx)
    labels, _pages, _robots = _spark_tables(spark, fx, rows)
    got = {(r["domain"], r["url"], r["created_seq"]) for r in
           select_label_batch(labels, res_limit, dom_limit).collect()}
    assert got == _mirror_batch(rows, res_limit, dom_limit)


def test_label_fetch_round_matches_mirror(spark, fx):
    rows = _label_rows(fx)
    labels, pages, robots = _spark_tables(spark, fx, rows)
    updated, lt = label_fetch_round(
        spark, labels, pages, robots,
        resources_per_domain=6, domain_limit=4)
    _batch, statuses, triples = _mirror_round(rows, fx, 6, 4)
    got_status = {r["url"]: r["status"] for r in updated.collect()}
    for d, u, seq, st in rows:
        assert got_status[u] == statuses.get(u, st), u
    got_triples = {
        (r["source"], r["subject"], r["predicate"], r["object_value"],
         r["object_language"]) for r in lt.collect()}
    assert got_triples == triples
    # at least one label triple and one error must be exercised
    assert triples
    assert "error" in statuses.values()
