"""Scale-shape tests for the round-4 pipeline reworks (VERDICT r3 #5/#6).

- ``q_embedding_near_dup``: a genuine dup cluster (near-identical
  embeddings all landing in ONE bucket at any band width) must produce
  O(n) candidates via the ``JACCARD_BUCKET_CAP`` + keeper-edge scheme,
  never the quadratic all-pairs join.
- ``q_ann_ivf``: cell count k ≈ √n derives from the corpus (not the 10
  fixture labels) identically in Spark and the DuckDB oracle — checked
  at two synthetic fixture sizes (the shipped sf0.001/sf0.01 parquet
  both hold 500 vectors, so size-sensitivity needs synthetic corpora).
"""

import random

import duckdb
import pytest

from derzis_spark import pipeline_queries as P


def _embedding_rows(n, seed=7, cluster=0):
    """n vectors of 64 floats; the first ``cluster`` rows are one
    near-duplicate cluster (base + 1e-3 jitter)."""
    rng = random.Random(seed)
    base = [rng.uniform(-1.0, 1.0) for _ in range(64)]
    rows = []
    for i in range(n):
        if i < cluster:
            v = [x + rng.uniform(-1e-3, 1e-3) for x in base]
        else:
            v = [rng.uniform(-1.0, 1.0) for _ in range(64)]
        rows.append((i, [float(x) for x in v], i % 10))
    return rows


def _write_fixture(spark, tmp_path, rows):
    sf_dir = str(tmp_path)
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{sf_dir}/embeddings.parquet")
    return sf_dir


def _duckdb_rows(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{sf_dir}/embeddings.parquet/*.parquet'")
    cur = con.execute(sql)
    cols = [c[0] for c in cur.description]
    return cols, cur.fetchall()


def _assert_spark_matches_duckdb(sdf, sf_dir, sql, name):
    s_cols = sdf.columns
    d_cols, d_rows = _duckdb_rows(sf_dir, sql)
    assert sorted(s_cols) == sorted(d_cols), (name, s_cols, d_cols)
    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    s_norm = sorted(tuple(r[s_cols[i]] for i in order)
                    for r in sdf.collect())
    dmap = {c: i for i, c in enumerate(d_cols)}
    d_norm = sorted(tuple(r[dmap[s_cols[i]]] for i in order)
                    for r in d_rows)
    assert s_norm == d_norm, (
        name, len(s_norm), len(d_norm),
        [p for p in zip(s_norm, d_norm) if p[0] != p[1]][:3])


def test_embedding_near_dup_dup_cluster_stays_linear(spark, tmp_path):
    n, cluster = 400, 300
    assert cluster > P.JACCARD_BUCKET_CAP
    sf_dir = _write_fixture(
        spark, tmp_path, _embedding_rows(n, cluster=cluster))
    out = P.q_embedding_near_dup(spark, sf_dir)
    rows = out.count()
    # keeper edges exist for the cluster (cluster-1 at minimum) ...
    assert rows >= cluster - 1
    # ... and the candidate volume is O(n·bands), nowhere near the
    # quadratic cluster pair count (~45k for a 300-member cluster)
    assert rows <= 3 * n, rows
    # the cluster collapsed to representative edges: every cluster pair
    # that survived involves the keeper (min vec_id = 0)
    clustered = out.filter(
        (out.a_id < cluster) & (out.b_id < cluster))
    assert clustered.filter(clustered.a_id != 0).count() == 0


def test_embedding_near_dup_dup_cluster_matches_oracle(spark, tmp_path):
    sf_dir = _write_fixture(
        spark, tmp_path, _embedding_rows(200, cluster=100))
    _assert_spark_matches_duckdb(
        P.q_embedding_near_dup(spark, sf_dir), sf_dir,
        P.SQL_EMBEDDING_NEAR_DUP, "embedding_near_dup")


@pytest.mark.parametrize("n", [300, 1200])
def test_ann_ivf_matches_oracle_at_two_sizes(spark, tmp_path, n):
    """k ≈ √n cells re-derive per corpus size in BOTH engines (the
    r3 parameterization nit): 300 → k=18 cells, 1200 → k=35 cells."""
    sf_dir = _write_fixture(spark, tmp_path, _embedding_rows(n))
    sdf = P.q_ann_ivf(spark, sf_dir)
    _assert_spark_matches_duckdb(
        sdf, sf_dir, P.SQL_ANN_IVF, f"ann_ivf[{n}]")
    import math
    k = max(2, math.ceil(math.sqrt(n)))
    cells = {r["cell"] for r in sdf.collect()}
    assert all(0 <= c < k for c in cells)


# --- round-4 additions: simhash_near_dup + dedup_clusters -----------------

def _doc_rows(n, dup=0, seed=11):
    """n documents; the first ``dup`` rows share one text (one dup
    cluster with identical SimHash fingerprints in every band)."""
    rng = random.Random(seed)
    vocab = [f"w{k}" for k in range(500)]
    base = " ".join(rng.choice(vocab) for _ in range(40))
    rows = []
    for i in range(n):
        text = base if i < dup else " ".join(
            rng.choice(vocab) for _ in range(40))
        rows.append((i, text, "en", f"s{i % 5}", len(text)))
    return rows


def _write_docs(spark, tmp_path, rows):
    sf_dir = str(tmp_path)
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{sf_dir}/documents.parquet")
    return sf_dir


def _duckdb_docs_rows(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'")
    cur = con.execute(sql)
    return [c[0] for c in cur.description], cur.fetchall()


def test_simhash_near_dup_dup_heavy_stays_linear(spark, tmp_path):
    """A 300-doc identical-text cluster lands in ONE bucket in every
    band (bsz > JACCARD_BUCKET_CAP) — the cap must collapse it to
    keeper edges so candidates stay O(n·bands), never ~45k all-pairs."""
    n, dup = 400, 300
    assert dup > P.JACCARD_BUCKET_CAP
    sf_dir = _write_docs(spark, tmp_path, _doc_rows(n, dup=dup))
    out = P.q_simhash_near_dup(spark, sf_dir)
    rows = [tuple(r) for r in out.collect()]
    # keeper edges for the whole cluster, at Hamming 0
    cluster = [(a, b, h) for (a, b, h) in rows if a < dup and b < dup]
    assert len(cluster) == dup - 1
    assert all(a == 0 and h == 0 for (a, b, h) in cluster)
    # total candidate volume bounded linearly, nowhere near C(300,2)
    assert len(rows) <= 4 * n, len(rows)


def test_simhash_near_dup_dup_heavy_matches_oracle(spark, tmp_path):
    sf_dir = _write_docs(spark, tmp_path, _doc_rows(200, dup=100))
    sdf = P.q_simhash_near_dup(spark, sf_dir)
    s_cols = sdf.columns
    d_cols, d_rows = _duckdb_docs_rows(sf_dir, P.SQL_SIMHASH_NEAR_DUP)
    assert sorted(s_cols) == sorted(d_cols)
    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    s_norm = sorted(tuple(r[s_cols[i]] for i in order)
                    for r in sdf.collect())
    dmap = {c: i for i, c in enumerate(d_cols)}
    d_norm = sorted(tuple(r[dmap[s_cols[i]]] for i in order)
                    for r in d_rows)
    assert s_norm == d_norm


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress everything to the component min
    return {x: find(x) for x in parent}


def test_dedup_clusters_matches_union_find(spark):
    """The distributed pointer-jumping labeling equals an independent
    in-memory union-find over the same verified edge list."""
    sf_dir = "/root/testdata/sf0.001"
    edges = [(r["a"], r["b"]) for r in
             P.q_jaccard_lsh_pairs(spark, sf_dir).select("a", "b")
             .collect()]
    assert edges, "fixture produced no near-dup edges"
    expect = _union_find(edges)
    got = {r["doc_id"]: r["keeper_doc_id"]
           for r in P.q_dedup_clusters(spark, sf_dir).collect()}
    assert got == expect
    sizes = {r["keeper_doc_id"]: r["cluster_size"]
             for r in P.q_dedup_clusters(spark, sf_dir).collect()}
    from collections import Counter
    assert sizes == Counter(expect.values())


def test_connected_components_chain_converges_logarithmically(spark):
    """A 300-node path graph has diameter 299: plain min-propagation
    would blow the 64-round cap, pointer jumping must converge in
    O(log n). Also pins correctness on the worst shape for label
    propagation (one long chain, min at one end)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(299)], "a long, b long")
    lab = P.connected_components(edges)
    rows = {r["doc_id"]: r["lbl"] for r in lab.collect()}
    assert rows == {i: 0 for i in range(300)}
    # diameter 299 → plain propagation needs 299 rounds; pointer
    # jumping must land near log2(300) ≈ 8
    assert P.LAST_CC_ROUNDS <= 16, P.LAST_CC_ROUNDS


# ---------------------------------------------------------------------------
# winnowing fingerprints (q_winnow_fingerprint)
# ---------------------------------------------------------------------------

def test_winnow_shared_substring_guarantee(spark, tmp_path):
    """The winnowing guarantee (Schleimer et al. §2): two docs sharing
    any substring of length >= k + w - 1 (11 chars at k=8, w=4) select
    at least one common fingerprint, regardless of the surrounding
    text. Docs 0/1 embed the same 16-char phrase in otherwise disjoint
    text; their selected-fingerprint sets must intersect."""
    shared = "zqxjkvbwpfmghydc"  # 16 chars > k + w - 1
    rows = [
        (0, f"aaa bbb ccc {shared} ddd eee", "en", "s0", 40),
        (1, f"nnn ooo ppp qqq rrr {shared} sss", "en", "s1", 44),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fps = {r["doc_id"]: set(r["fps"])
           for r in P._winnow_fps_df(d).collect()}
    assert fps[0] & fps[1], "shared 16-char substring selected no common fp"


def test_winnow_disjoint_docs_share_nothing(spark, tmp_path):
    """Docs over disjoint alphabets select disjoint fingerprints (the
    grouping surfaces no cross-doc groups)."""
    rows = [
        (0, "abc abd abe abf abg abh abi abj abk abl", "en", "s0", 39),
        (1, "nop nqr nst nuv nwx nyz opq ors otu ovw", "en", "s1", 39),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = P.q_winnow_fingerprint(spark, sf_dir)
    assert out.filter("group_size > 1").count() == 0


def test_winnow_matches_oracle_on_synthetic(spark, tmp_path):
    """Spark winnowing equals the DuckDB restatement on a synthetic
    corpus with real partial overlap (beyond the shipped sf dirs)."""
    rows = _doc_rows(60, dup=6, seed=23)
    sf_dir = _write_docs(spark, tmp_path, rows)
    sdf = P.q_winnow_fingerprint(spark, sf_dir)
    s_rows = sorted(tuple(r) for r in sdf.collect())
    cols, d_rows = _duckdb_docs_rows(sf_dir, P.SQL_WINNOW_FINGERPRINT)
    assert sdf.columns == cols
    assert s_rows == sorted(tuple(r) for r in d_rows)
    # the dup cluster shares every fingerprint: some group has all 6
    assert sdf.filter("group_size >= 6").count() > 0


# ---------------------------------------------------------------------------
# 3-word shingle Jaccard (q_jaccard_shingle_pairs)
# ---------------------------------------------------------------------------

def test_shingle_pairs_order_sensitive(spark, tmp_path):
    """The shingle variant is word-ORDER-sensitive where the unigram
    variant is not: doc 1 is doc 0's words shuffled (identical word
    SET), doc 2 is an exact copy of doc 0. The unigram op pairs all
    three (token-set jaccard 1.0); the shingle op must pair only the
    exact copy and never the shuffle."""
    rng = random.Random(3)
    vocab = [f"w{k}" for k in range(200)]
    words = [rng.choice(vocab) for _ in range(40)]
    shuffled = list(words)
    while shuffled == words:
        rng.shuffle(shuffled)
    rows = [(0, " ".join(words), "en", "s0", 40),
            (1, " ".join(shuffled), "en", "s1", 40),
            (2, " ".join(words), "en", "s2", 40)]
    rows += [(i, " ".join(rng.choice(vocab) for _ in range(40)),
              "en", f"s{i % 5}", 40) for i in range(3, 24)]
    sf_dir = _write_docs(spark, tmp_path, rows)

    uni = {(r["a"], r["b"])
           for r in P.q_jaccard_lsh_pairs(spark, sf_dir).collect()}
    assert (0, 1) in uni and (0, 2) in uni

    sh = {(r["a"], r["b"]): r["jaccard"]
          for r in P.q_jaccard_shingle_pairs(spark, sf_dir).collect()}
    assert sh.get((0, 2)) == 1.0
    assert not any(1 in pair for pair in sh), sh


# ---------------------------------------------------------------------------
# decontamination (q_decontaminate)
# ---------------------------------------------------------------------------

def test_decontaminate_flags_planted_13gram(spark, tmp_path):
    """A train doc embedding a verbatim 13-word span of an eval doc is
    flagged against exactly that eval doc; a train doc overlapping by
    only 12 words is not. Eval split = doc_id % 10 == 0."""
    rng = random.Random(9)
    vocab = [f"v{k}" for k in range(300)]
    eval_words = [rng.choice(vocab) for _ in range(30)]
    span13 = eval_words[5:18]
    span12 = eval_words[5:17]
    mk = lambda ws: " ".join(ws)
    rows = [
        (0, mk(eval_words), "en", "s0", 30),          # eval doc
        (1, mk([rng.choice(vocab) for _ in range(10)] + span13
               + [rng.choice(vocab) for _ in range(10)]), "en", "s1", 33),
        (2, mk([rng.choice(vocab) for _ in range(10)] + span12
               + [rng.choice(vocab) for _ in range(10)]), "en", "s2", 32),
        (10, mk([rng.choice(vocab) for _ in range(30)]), "en", "s3", 30),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {(r["doc_id"], r["eval_doc_id"]): r["n_shared_ngrams"]
           for r in P.q_decontaminate(spark, sf_dir).collect()}
    assert got == {(1, 0): 1}

    cols, d_rows = _duckdb_docs_rows(sf_dir, P.SQL_DECONTAMINATE)
    assert {(r[0], r[1]): r[2] for r in d_rows} == {(1, 0): 1}


# ---------------------------------------------------------------------------
# repetition signals (q_text_stats Gopher-style 2-gram shares)
# ---------------------------------------------------------------------------

def test_text_stats_repetition_shares(spark, tmp_path):
    """'x y x y x y' has 2-grams {x y:3, y x:2} -> top 3/5, dup 5/5;
    an all-distinct doc has dup 0; a 1-word doc has no 2-grams and
    null shares. Spark run-length scan == DuckDB relational count."""
    rows = [
        (0, "x y x y x y", "en", "s0", 11),
        (1, "p q r s", "en", "s1", 7),
        (2, "solo", "en", "s2", 4),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in P.q_text_stats(spark, sf_dir).collect()}
    assert got[0]["n_2grams"] == 5
    assert got[0]["top2gram_share"] == 0.6
    assert got[0]["dup_2gram_share"] == 1.0
    assert got[1]["n_2grams"] == 3
    assert got[1]["top2gram_share"] == round(1 / 3, 6)
    assert got[1]["dup_2gram_share"] == 0.0
    assert got[2]["n_2grams"] == 0
    assert got[2]["top2gram_share"] is None
    assert got[2]["dup_2gram_share"] is None

    cols, d_rows = _duckdb_docs_rows(sf_dir, P.SQL_TEXT_STATS)
    i = {c: k for k, c in enumerate(cols)}
    duck = {r[i["doc_id"]]: r for r in d_rows}
    for doc in (0, 1, 2):
        for c in ("n_2grams", "top2gram_share", "dup_2gram_share"):
            assert duck[doc][i[c]] == got[doc][c], (doc, c)


# ---------------------------------------------------------------------------
# IVF Lloyd refinement (q_ann_ivf_lloyd / ivf_topk)
# ---------------------------------------------------------------------------

def _clustered_rows(n, n_clusters=16, sigma=0.05, seed=3):
    """n vectors in 64-d with C planted clusters (cluster of vector i
    = i % C, so stride-sampled IVF seeds hit every cluster); noise
    norm sigma*8 << 1 keeps the structure dominant — the regime real
    text-embedding corpora live in (scripts/ann_recall.py)."""
    rng = random.Random(seed)
    centers = [[rng.gauss(0.0, 1.0) for _ in range(64)]
               for _ in range(n_clusters)]
    return [
        (i, [float(x + rng.gauss(0.0, sigma))
             for x in centers[i % n_clusters]], i % 10)
        for i in range(n)
    ]


@pytest.mark.parametrize("n", [300, 1200])
def test_ann_ivf_lloyd_matches_oracle_at_two_sizes(spark, tmp_path, n):
    """The 2-iteration Lloyd chain (assign -> mean -> assign -> mean ->
    assign) re-derives identically in Spark and DuckDB at two corpus
    sizes (k and the stride both depend on n)."""
    sf_dir = _write_fixture(spark, tmp_path, _embedding_rows(n))
    _assert_spark_matches_duckdb(
        P.q_ann_ivf_lloyd(spark, sf_dir), sf_dir,
        P.SQL_ANN_IVF_LLOYD, f"ann_ivf_lloyd[{n}]")


def test_lloyd_refinement_lifts_recall_on_clustered_corpus(spark, tmp_path):
    """On a planted-cluster corpus the stride-seeded quantizer is a
    weak approximation; 2 Lloyd iterations must recover (essentially)
    the true clusters: recall@10 vs the exact brute-force top-10 goes
    to >= 0.9 and never drops below the unrefined scheme."""
    sf_dir = _write_fixture(spark, tmp_path, _clustered_rows(400))
    truth = {r["vec_id"] for r in
             P.q_ann_bruteforce_cosine(spark, sf_dir).collect()}
    e = P.load(spark, sf_dir, "embeddings")
    stride = {r["vec_id"] for r in P.ivf_topk(e, iters=0).collect()}
    lloyd = {r["vec_id"] for r in P.ivf_topk(e, iters=2).collect()}
    r0 = len(truth & stride) / len(truth)
    r2 = len(truth & lloyd) / len(truth)
    assert r2 >= r0, (r0, r2)
    assert r2 >= 0.9, (r0, r2)


# ---------------------------------------------------------------------------
# passage-level dedup (q_segment_dedup, seg16_md5)
# ---------------------------------------------------------------------------

def test_segment_dedup_finds_shared_passage(spark, tmp_path):
    """Two docs share one exact 16-word passage at different offsets
    but differ elsewhere: whole-doc md5 puts them in separate groups,
    segment dedup groups the aligned shared span. Spark == DuckDB."""
    shared = " ".join(f"s{k}" for k in range(16))
    rows = [
        (0, shared + " tail0 a b c", "en", "s0", 0),
        (1, shared + " other words entirely", "en", "s1", 0),
        (2, "unrelated text with nothing shared at all", "en", "s2", 0),
    ]
    rows = [(i, t, l, s, len(t)) for i, t, l, s, _ in rows]
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = P.q_segment_dedup(spark, sf_dir).collect()
    dup = [r for r in out if r["group_size"] > 1]
    # exactly one duplicated segment: the shared leading 16 words
    assert len(dup) == 1 and dup[0]["min_doc_id"] == 0, dup
    assert dup[0]["group_size"] == 2

    cols, d_rows = _duckdb_docs_rows(sf_dir, P.SQL_SEGMENT_DEDUP)
    i = {c: k for k, c in enumerate(cols)}
    d_dup = [r for r in d_rows if r[i["group_size"]] > 1]
    assert len(d_dup) == 1
    assert {r["fingerprint"] for r in dup} == \
        {r[i["fingerprint"]] for r in d_dup}
