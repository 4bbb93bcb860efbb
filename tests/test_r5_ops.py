"""Round-5 pipeline operators: PII scrub, weighted corpus mixing,
content-defined (alignment-invariant) segment dedup, and the
char-trigram language-ID upgrade. Each gets the two-size DuckDB
oracle (the pytest equivalent of a driver correctness row — the
driver's 50-entry cap is full) plus a planted fixture proving the
behavior its simpler predecessor misses."""

import duckdb
import pytest

from derzis_spark import pipeline_queries as P
from derzis_spark.queries import TABLES
from tests.test_entry_queries import norm_rows
from tests.test_pipeline_scale import _duckdb_docs_rows, _write_docs


SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _cmp_oracle(spark_df, sf_dir, sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(sql)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(o_cols), (s_cols, o_cols)
    assert len(s_rows) == len(o_rows)
    assert norm_rows(s_cols, s_rows) == norm_rows(o_cols, o_rows)
    return s_rows


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_pii_scrub_matches_oracle(spark, sf_dir):
    _cmp_oracle(P.q_pii_scrub(spark, sf_dir), sf_dir, P.SQL_PII_SCRUB)


def test_pii_scrub_planted(spark, tmp_path):
    """Planted emails / phones / IPs are counted and redacted; a digit
    run inside an email never double-counts as a phone (counts run on
    the progressively redacted text)."""
    rows = [
        (0, "contact bob.smith+x@corp-mail.example.org or "
            "alice@ex.co today", "en", "s0", 60),
        (1, "server at 10.0.255.7 and 192.168.1.1 rebooted", "en",
         "s1", 46),
        (2, "call +351 555-123-4567 or 555 987 6543 now", "en",
         "s2", 42),
        (3, "mail 555-123-4567@phone-mail.example.com please", "en",
         "s3", 47),
        (4, "no pii here at all", "en", "s4", 18),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in P.q_pii_scrub(spark, sf_dir).collect()}
    assert (got[0]["n_emails"], got[0]["n_ipv4"],
            got[0]["n_phones"]) == (2, 0, 0)
    assert got[0]["redacted"] == "contact <EMAIL> or <EMAIL> today"
    assert got[1]["n_ipv4"] == 2
    assert got[1]["redacted"] == "server at <IP> and <IP> rebooted"
    assert got[2]["n_phones"] == 2
    assert got[2]["redacted"] == "call +351 <PHONE> or <PHONE> now"
    # the phone-shaped digits were consumed by the email redaction
    assert (got[3]["n_emails"], got[3]["n_phones"]) == (1, 0)
    assert got[3]["redacted"] == "mail <EMAIL> please"
    assert got[4]["redacted"] == rows[4][1]
    # DuckDB replays the identical scrub on the planted rows
    sdf = P.q_pii_scrub(spark, sf_dir)
    cols, d_rows = _duckdb_docs_rows(sf_dir, P.SQL_PII_SCRUB)
    assert norm_rows(cols, d_rows) == norm_rows(
        sdf.columns, [tuple(r) for r in sdf.collect()])


# ---------------------------------------------------------------------------
# weighted corpus mixing
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_corpus_mix_matches_oracle(spark, sf_dir):
    """Spark selection == DuckDB selection under the SAME integer
    thresholds (mix_rates is the single source of truth; the SQL is
    generated from its output, like a templated sampling predicate)."""
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    counts = dict(con.execute(
        "SELECT lang, COUNT(*) FROM documents GROUP BY 1").fetchall())
    thr = P.mix_rates(counts, P.CORPUS_MIX_WEIGHTS)
    sdf = P.q_corpus_mix(spark, sf_dir)
    s_rows = sorted(tuple(r) for r in sdf.collect())
    o_rows = sorted(con.execute(P.sql_corpus_mix(thr)).fetchall())
    assert s_rows == o_rows and len(s_rows) > 0


def test_corpus_mix_rates_properties():
    """The binding group keeps everything; other groups downsample to
    the exact target proportion of the largest feasible mix; groups
    without a weight get threshold 0."""
    counts = {"en": 8000, "es": 1000, "de": 500, "xx": 123}
    w = {"en": 0.5, "es": 0.25, "de": 0.25}
    thr = P.mix_rates(counts, w)
    # de binds: total = 500/.25 = 2000 → en rate 2000*.5/8000 = .125,
    # es rate 2000*.25/1000 = .5, de rate 1.0
    assert thr["de"] == P.MIX_HASH_MOD
    assert thr["en"] == int(0.125 * P.MIX_HASH_MOD)
    assert thr["es"] == int(0.5 * P.MIX_HASH_MOD)
    assert "xx" not in thr
    # a weighted group with no rows zeroes out but never divides
    thr2 = P.mix_rates({"en": 10}, {"en": 0.5, "es": 0.5})
    assert thr2 == {"en": P.MIX_HASH_MOD, "es": 0}


def test_corpus_mix_deterministic_and_proportioned(spark, tmp_path):
    """On a skewed planted corpus the sampled mix hits the target
    shares (hash-threshold sampling is binomial-exact in expectation;
    tolerance covers the variance) and re-running gives the identical
    row set — no seed, no order dependence."""
    rows = []
    i = 0
    for lang, n in (("en", 1200), ("es", 300), ("de", 100)):
        for _ in range(n):
            rows.append((i, f"text {i}", lang, "s0", 10))
            i += 1
    sf_dir = _write_docs(spark, tmp_path, rows)
    d = P.load(spark, sf_dir, "documents").select("doc_id", "lang")
    w = {"en": 0.4, "es": 0.4, "de": 0.2}
    out1, thr = P.corpus_mix(spark, d, "lang", w)
    got1 = sorted(tuple(r) for r in out1.select("doc_id", "lang")
                  .collect())
    out2, _ = P.corpus_mix(spark, d, "lang", w)
    got2 = sorted(tuple(r) for r in out2.select("doc_id", "lang")
                  .collect())
    assert got1 == got2
    # de binds (100/._2=500 total): de kept fully, en ≈ 200, es ≈ 200
    by_lang = {}
    for _, lang in got1:
        by_lang[lang] = by_lang.get(lang, 0) + 1
    assert by_lang["de"] == 100
    assert abs(by_lang["en"] - 200) < 60
    assert abs(by_lang["es"] - 200) < 60


# ---------------------------------------------------------------------------
# content-defined segment dedup
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_cdc_segment_dedup_matches_oracle(spark, sf_dir):
    _cmp_oracle(P.q_cdc_segment_dedup(spark, sf_dir), sf_dir,
                P.SQL_CDC_SEGMENT_DEDUP)


def test_cdc_catches_boundary_straddling_duplicate(spark, tmp_path):
    """A 48-word passage duplicated at MISALIGNED offsets (3 and 11 —
    different residues mod 16 AND mod 8) straddles every fixed
    segment grid, so seg16 finds no shared segment; content-defined
    chunks are alignment-invariant, so the shared interior chunks
    collide."""
    import random

    rng = random.Random(17)
    vocab = [f"w{k}" for k in range(500)]
    passage = [rng.choice(vocab) for _ in range(48)]
    mk = lambda pre, post: " ".join(
        [rng.choice(vocab) for _ in range(pre)] + passage
        + [rng.choice(vocab) for _ in range(post)])
    rows = [
        (0, mk(3, 20), "en", "s0", 0),
        (1, mk(11, 20), "en", "s1", 0),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)

    def shared(df):
        return [r for r in df.collect()
                if r["group_size"] >= 2 and len(r["fingerprint"]) > 0]

    seg_shared = [
        r for r in shared(P.q_segment_dedup(spark, sf_dir))]
    cdc_shared = [
        r for r in shared(P.q_cdc_segment_dedup(spark, sf_dir))]
    assert cdc_shared, "cdc missed the misaligned duplicate passage"
    assert not seg_shared, \
        "fixture no longer straddles the fixed segment grid"
    # the DuckDB mirror sees the same shared chunks
    cols, d_rows = _duckdb_docs_rows(sf_dir, P.SQL_CDC_SEGMENT_DEDUP)
    d_shared = [r for r in d_rows if r[1] >= 2]
    assert sorted(r[0] for r in d_shared) == \
        sorted(r["fingerprint"] for r in cdc_shared)


def test_doc_fingerprint_union_carries_cdc_scheme(spark):
    """The driver union row gained the cdc_w8 tag: its rows equal the
    standalone operator's, and the oracle SQL matches."""
    sf = "/root/testdata/sf0.001"
    uni = P.q_doc_fingerprint_all(spark, sf)
    cdc_rows = sorted(
        (r["fingerprint"], r["group_size"], r["min_doc_id"])
        for r in uni.filter(uni.scheme == "cdc_w8").collect())
    alone = sorted(tuple(r) for r in
                   P.q_cdc_segment_dedup(spark, sf).collect())
    assert cdc_rows == alone


# ---------------------------------------------------------------------------
# language ID (char-trigram profiles)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_lang_id_matches_oracle(spark, sf_dir):
    _cmp_oracle(P.q_lang_id(spark, sf_dir), sf_dir, P.SQL_LANG_ID)


def test_lang_id_trigrams_beat_marker_voting(spark, tmp_path):
    """Real-language snippets where the retired marker heuristic
    ('the'/'a'/'and' ⇒ en) misfires: the Spanish and French texts
    contain the standalone word 'a', the German one contains 'die'
    (not a marker, but trigram-ambiguous with English) — trigram
    profiles pick the right language for all four."""
    rows = [
        (0, "the quick brown fox jumped over the lazy dog and then "
            "ran into the woods", "en", "s0", 0),
        (1, "vamos a la casa de la familia que vive en la ciudad y "
            "el campo", "es", "s1", 0),
        (2, "nous allons a la maison pour parler avec les amis et "
            "leur famille", "fr", "s2", 0),
        (3, "die kinder gehen in die schule und lernen rechnen und "
            "schreiben", "de", "s3", 0),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {(r["declared"], r["predicted"]): r["n"]
           for r in P.q_lang_id(spark, sf_dir).collect()}
    assert got == {("en", "en"): 1, ("es", "es"): 1,
                   ("fr", "fr"): 1, ("de", "de"): 1}, got
    # marker voting would have said 'en' for (1) and (2): they
    # contain the standalone marker word 'a'
    assert " a " in rows[1][1] and " a " in rows[2][1]
    cols, d_rows = _duckdb_docs_rows(sf_dir, P.SQL_LANG_ID)
    assert {(r[0], r[1]): r[2] for r in d_rows} == got


def test_lang_id_unknown_on_no_signal(spark, tmp_path):
    """A doc whose prefix contains no profile trigram stays unknown
    (empty text included)."""
    rows = [(0, "zzz qqq xxx", "en", "s0", 0),
            (1, "", "zh", "s1", 0)]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {(r["declared"], r["predicted"]): r["n"]
           for r in P.q_lang_id(spark, sf_dir).collect()}
    assert got == {("en", "unknown"): 1, ("zh", "unknown"): 1}
