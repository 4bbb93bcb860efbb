"""Training-data-pipeline operators over ``documents`` / ``embeddings``:
deduplication (exact, minhash-LSH, simhash, token-Jaccard), similarity
search (brute-force cosine top-k, LSH-bucketed), text analysis
(language-ID, quality scoring, token counts, fingerprinting), and the
multimodal binary-column plumbing stub.

Same dual-expression contract as :mod:`derzis_spark.queries`: every
operator has a Spark DataFrame callable and a value-identical DuckDB
oracle SQL (md5 is the cross-engine hash primitive — both produce the
same lowercase hex, so minhash/simhash signatures match exactly).

Scale notes: pair-producing ops (Jaccard, LSH) are bucketed (by source
/ band) so candidate pairs stay bounded; the brute-force cosine top-k
broadcasts the single query vector; all shuffles key on doc_id/band
hashes (uniform).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from derzis_spark.queries import load

N_MINHASH = 8
STOPWORDS = ("the", "a")
#: the same list rendered for the DuckDB oracles — interpolated
#: into SQL_QUALITY_SCORE / SQL_TEXT_STATS so editing STOPWORDS
#: can never silently desync Spark/DuckDB parity
_SQL_STOPWORDS = ", ".join(f"'{s}'" for s in STOPWORDS)


def _words():
    return F.split(F.col("text"), " ")


def _spread(df: DataFrame) -> DataFrame:
    """Scale-adaptive input spreading for CPU-heavy per-row stages.

    The bench corpora are single-row-group parquet files, so their scan
    plans as ONE task and every expensive per-row projection (trigram
    scoring, Karp-Rabin grams, shingle builds, regex scrubs) serializes
    on one core while the other N-1 idle (guide §2.6/§6: input split
    planning bounds stage parallelism). When the scan has fewer
    partitions than the cluster's parallelism, a round-robin
    repartition of the (tiny) raw rows buys full-width compute for one
    sub-MB exchange. At 100 TB the scan already has orders of magnitude
    more splits than cores — the condition is false and this is a
    literal no-op, so nothing is tuned to local mode."""
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash (hash-groupBy): keeper = min doc_id
    per md5(text)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("content_hash", F.md5(F.col("text").cast("binary")))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keeper_doc_id"),
             F.count("*").alias("n_copies"))
    )

SQL_DEDUP_EXACT = """
  SELECT md5(text) AS content_hash,
         MIN(doc_id) AS keeper_doc_id,
         COUNT(*) AS n_copies
  FROM documents GROUP BY 1
"""


def _minhash_wide(spark, sf_dir) -> DataFrame:
    """One row per doc: (doc_id, s0..s7) — the single hash-agg pass
    shared by the signature query (which posexplodes it) and the band
    queries (which build band values straight from the wide columns,
    skipping the re-group of 8 rows/doc back into bands).

    Tokens are deduped per doc BEFORE hashing (``array_distinct``):
    MinHash is defined on the token *set*, and ``min`` over a multiset
    equals ``min`` over its support — identical signatures, but the
    md5-per-token pass and the partial agg see only distinct tokens
    (57% of this corpus's tokens are within-doc repeats; real text is
    similar, so the saving holds at 100 TB)."""
    d = load(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.array_distinct(_words())).alias("w"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(h)), F.col("w"))
                    .cast("binary"))).alias(f"s{h}")
        for h in range(N_MINHASH)]
    return tokens.groupBy("doc_id").agg(*aggs)


def q_minhash_signatures(spark, sf_dir):
    """MinHash signatures over token sets: sig_h = min(md5(h || token))
    for h in 0..7. Cross-engine identical because md5 hex strings
    compare identically.

    Computed as 8 ``min`` aggregations in ONE map-side-combinable
    hash-agg pass over the token rows (the ``q_minhash64_signatures``
    shape) — no 8× crossJoin row explosion through the shuffle; the
    8 md5 calls per token are the operator's definition."""
    wide = _minhash_wide(spark, sf_dir)
    return wide.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"s{h}") for h in range(N_MINHASH)]))
        .alias("h", "sig"),
    ).select("doc_id", F.col("h").cast("long").alias("h"), "sig")

SQL_MINHASH_SIGNATURES = f"""
  SELECT d.doc_id, t.h, MIN(md5(CAST(t.h AS VARCHAR) || u.w)) AS sig
  FROM documents d,
       UNNEST(string_split(d.text, ' ')) AS u(w),
       UNNEST(range(0, {N_MINHASH})) AS t(h)
  GROUP BY d.doc_id, t.h
"""


def q_minhash_lsh_buckets(spark, sf_dir):
    """MinHash-LSH banding: band b = concat of 2 consecutive sigs;
    bucket histogram per (band_id, band_value) with >1 member — the
    candidate-pair buckets, reported as sizes (scale-safe: avoids the
    quadratic pair blow-up on near-identical corpora).

    Bands come straight off the wide signature row (band b = the
    sig-sorted concat of s_{2b}, s_{2b+1}), so the whole plan has ONE
    shuffle on doc tokens and one on band buckets — the old
    posexplode → groupBy(doc_id, band_id) path re-shuffled 8 rows/doc
    just to reassemble columns that were already on one row."""
    wide = _minhash_wide(spark, sf_dir)
    vals = [
        F.concat_ws("|", F.array_sort(
            F.array(F.col(f"s{2 * b}"), F.col(f"s{2 * b + 1}"))))
        for b in range(N_MINHASH // 2)]
    bands = wide.select(
        "doc_id",
        F.posexplode(F.array(*vals)).alias("band_id", "band_value"))
    return (
        bands.groupBy("band_id", "band_value")
        .agg(F.count("*").alias("bucket_size"),
             F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("bucket_size") > 1)
    )

SQL_MINHASH_LSH_BUCKETS = f"""
  WITH sigs AS ({SQL_MINHASH_SIGNATURES}),
  bands AS (
    SELECT doc_id, CAST(h // 2 AS INT) AS band_id,
           string_agg(sig, '|' ORDER BY sig) AS band_value
    FROM sigs GROUP BY doc_id, band_id
  )
  SELECT band_id, band_value, COUNT(*) AS bucket_size,
         MIN(doc_id) AS min_doc_id
  FROM bands GROUP BY band_id, band_value
  HAVING COUNT(*) > 1
"""


def q_simhash(spark, sf_dir):
    """SimHash (16-bit) over tokens: bit k votes by the parity of hex
    digit k of md5(token); fingerprint = Σ bit_k·2^k.

    The 16 bit votes are 16 conditional ``sum`` aggregations in ONE
    map-side-combinable hash-agg pass (the ``q_minhash64_signatures``
    shape) — one md5 per token, no 16× crossJoin row explosion through
    the shuffle, all whole-stage-codegen JVM exprs."""
    d = load(spark, sf_dir, "documents")
    tokens = d.select("doc_id", F.explode(_words()).alias("w")) \
        .withColumn("wh", F.md5(F.col("w").cast("binary")))

    def vote(k: int):
        digit = F.substring(F.col("wh"), k + 1, 1)
        odd = (F.instr(F.lit("0123456789abcdef"), digit) - 1) % 2 == 1
        return F.when(odd, F.lit(1)).otherwise(F.lit(-1))

    votes = tokens.groupBy("doc_id").agg(
        *[F.sum(vote(k)).alias(f"v{k}") for k in range(16)])
    fp = None
    for k in range(16):
        bit = F.when(F.col(f"v{k}") > 0, F.lit(2 ** k)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return votes.select("doc_id", fp.cast("long").alias("simhash"))

SQL_SIMHASH = """
  WITH tokens AS (
    SELECT d.doc_id, md5(u.w) AS wh
    FROM documents d, UNNEST(string_split(d.text, ' ')) AS u(w)
  ),
  votes AS (
    SELECT doc_id, t.k,
           CASE WHEN (strpos('0123456789abcdef', substr(wh, CAST(t.k + 1 AS INT), 1)) - 1) % 2 = 1
                THEN 1 ELSE -1 END AS vote
    FROM tokens, UNNEST(range(0, 16)) AS t(k)
  ),
  bits AS (
    SELECT doc_id, k, CASE WHEN SUM(vote) > 0 THEN 1 ELSE 0 END AS bit
    FROM votes GROUP BY doc_id, k
  )
  SELECT doc_id, CAST(SUM(bit * CAST(POW(2.0, k) AS BIGINT)) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
"""


#: all-pairs candidate generation only inside LSH buckets up to this
#: size; bigger buckets fall back to representative (keeper) edges so
#: one dup-heavy bucket can never go quadratic
JACCARD_BUCKET_CAP = 64


def q_jaccard_near_dup(spark, sf_dir):
    """Token-set Jaccard near-dup pairs (J ≥ 0.8), candidate-blocked by
    the MinHash-LSH bands of ``q_minhash64_signatures`` — NOT by a
    token-level self-join (whose worst-case is quadratic in the docs
    sharing a token). Buckets up to ``JACCARD_BUCKET_CAP`` members emit
    all intra-bucket pairs (the complete near-dup pair list); larger
    buckets emit representative member→bucket-min edges (O(n) — any
    bucket that large is one dup cluster, and the keeper edge is what
    dedup consumes). Survivors are verified with exact token-set
    Jaccard via a JVM ``array_intersect`` on the docs' distinct-token
    arrays — no token row explosion anywhere in the plan."""
    cap = JACCARD_BUCKET_CAP
    bands = _minhash64_bands(spark, sf_dir)
    # bucket occupancy + representative as WINDOW aggs over ONE
    # (band_id, band_value) exchange, materialized once for the three
    # consumers (small-pair a/b sides + keeper edges) — the old
    # groupBy + self-join re-ran the md5 signature agg per consumer
    wb = Window.partitionBy("band_id", "band_value")
    bx = (bands.withColumn("bsz", F.count("*").over(wb))
          .withColumn("bmin", F.min("doc_id").over(wb))
          .localCheckpoint(eager=True))
    small = bx.filter(F.col("bsz") <= cap)
    pairs_small = (
        small.select("band_id", "band_value", F.col("doc_id").alias("a"))
        .join(small.select("band_id", "band_value",
                           F.col("doc_id").alias("b")),
              ["band_id", "band_value"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    pairs_large = (
        bx.filter((F.col("bsz") > cap) & (F.col("doc_id") > F.col("bmin")))
        .select(F.col("bmin").alias("a"), F.col("doc_id").alias("b"))
    )
    cand = pairs_small.unionByName(pairs_large).distinct()
    return _jaccard_verify(spark, sf_dir, cand)


def _jaccard_verify(spark, sf_dir, cand, unit="words"):
    """Exact token-set Jaccard (≥ 0.8) verify over candidate (a, b)
    pairs, shared by all blocking schemes; ``unit`` selects the unit
    of comparison ("words" = whitespace words; "shingles" = 3-word
    shingles, staged per ``_shingles_col``). The distinct-token arrays
    are built only for docs that appear in some candidate pair (a
    LEFT SEMI prune before the re-tokenize): at 100 TB most docs share
    no LSH bucket with anything, and re-splitting their text just to
    throw it away would dominate the verify stage. The candidate set
    is materialized once (eager localCheckpoint) because it feeds
    three consumers (the prune and both pair-join sides) and Spark's
    exchange reuse does not unify their differently-pruned subtrees —
    without it the signature hash-agg would recompute per consumer
    (measured 25-45% slower at sf0.1). The intersect runs JVM-side
    (``array_intersect``), O(pairs × avg tokens), no token row
    explosion."""
    cand = cand.localCheckpoint(eager=True)
    d = load(spark, sf_dir, "documents")
    ids = (cand.select(F.col("a").alias("doc_id"))
           .unionByName(cand.select(F.col("b").alias("doc_id")))
           .distinct())
    pruned = d.join(ids, "doc_id", "left_semi")
    if unit == "shingles":
        tarr = _shingle_docs(pruned).select(
            "doc_id", F.array_distinct("sh").alias("ta"))
    else:
        tarr = _spread(pruned.select("doc_id", "text")).select(
            "doc_id", F.array_distinct(_words()).alias("ta"))
    # materialize the distinct-token arrays ONCE: they feed both the
    # a-side and b-side joins, and the planner duplicates the whole
    # semi-prune + re-tokenize subtree per side otherwise (two extra
    # corpus-scan + split passes observed in the r6 before-plan)
    tarr = tarr.localCheckpoint(eager=True)
    return (
        cand.join(tarr.select(F.col("doc_id").alias("a"),
                              F.col("ta").alias("t_a")), "a")
        .join(tarr.select(F.col("doc_id").alias("b"),
                          F.col("ta").alias("t_b")), "b")
        .select(
            "a", "b",
            F.size(F.array_intersect("t_a", "t_b")).alias("n_common"),
            F.size("t_a").alias("sz_a"), F.size("t_b").alias("sz_b"))
        .withColumn(
            "jaccard",
            F.round(F.col("n_common").cast("double")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                    6))
        .filter((F.col("n_common") > 0) & (F.col("jaccard") >= 0.8))
        .select("a", "b", "n_common", "jaccard")
    )


# (SQL_JACCARD_NEAR_DUP is defined below SQL_MINHASH64_SIGNATURES,
# which its banding CTE embeds)
N_MINHASH64 = 64
MINHASH64_ROWS_PER_BAND = 8  # 8 bands × 8 rows → LSH threshold ≈ 0.77
#: Mersenne prime 2^31-1: a*x+b stays < 2^62, so the affine permuters
#: never overflow signed int64 in EITHER engine (DuckDB errors on
#: BIGINT overflow; Spark wraps — both are avoided)
MINHASH64_P = 2147483647


def _minhash64_params() -> list[tuple[int, int]]:
    import random
    rng = random.Random(64)
    return [(rng.randrange(1, MINHASH64_P), rng.randrange(0, MINHASH64_P))
            for _ in range(N_MINHASH64)]

MINHASH64_AB = _minhash64_params()


def _token_base_col(w_col):
    """Cross-engine 60-bit base hash of one token: first 15 hex digits
    of md5(token) parsed base-16, reduced mod P. Spark's ``conv`` and
    DuckDB's ``CAST('0x…' AS BIGINT)`` agree exactly; ONE md5 per
    token, the 64 permutations are affine (a·x+b mod P) arithmetic."""
    return F.conv(
        F.substring(F.md5(w_col.cast("binary")), 1, 15),
        16, 10).cast("long") % F.lit(MINHASH64_P)


def _minhash64_wide(spark, sf_dir) -> DataFrame:
    """One row per doc: (doc_id, s0..s63) — the single hash-agg pass
    shared by the signature query and the LSH band queries. Tokens are
    deduped per doc before hashing (min over a multiset = min over its
    support — see ``_minhash_wide``), halving the md5+conv pass."""
    d = load(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.array_distinct(_words())).alias("w")
    ).select("doc_id", _token_base_col(F.col("w")).alias("bm"))
    aggs = [
        F.min((F.lit(a) * F.col("bm") + F.lit(b)) % F.lit(MINHASH64_P))
        .alias(f"s{i}")
        for i, (a, b) in enumerate(MINHASH64_AB)]
    return tokens.groupBy("doc_id").agg(*aggs)


def _minhash64_bands(spark, sf_dir) -> DataFrame:
    """(doc_id, band_id, band_value) straight from the wide signature
    row: band b concatenates s_{8b}..s_{8b+7} in h order — exactly the
    string the old posexplode → groupBy(doc_id, band_id) →
    sort-by-h concat produced, without re-shuffling 64 rows/doc to
    reassemble columns that already live on one row. At 10^9 docs
    that skipped exchange is 64× the doc count in rows."""
    rpb = MINHASH64_ROWS_PER_BAND
    wide = _minhash64_wide(spark, sf_dir)
    vals = [
        F.concat_ws("|", *[F.col(f"s{b * rpb + r}").cast("string")
                           for r in range(rpb)])
        for b in range(N_MINHASH64 // rpb)]
    return wide.select(
        "doc_id",
        F.posexplode(F.array(*vals)).alias("band_id", "band_value"))


def q_minhash64_signatures(spark, sf_dir):
    """Production-parameter MinHash: 64 permutations with int64 hash
    values — ONE md5 per token plus 64 affine permuters (a_i·x+b_i
    mod 2^31-1), computed as 64 min aggregations in ONE map-side-
    combinable hash-agg pass over the token rows (no 64× row
    explosion, no 64× hashing, all whole-stage-codegen JVM exprs)."""
    wide = _minhash64_wide(spark, sf_dir)
    return wide.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"s{i}")
                               for i in range(N_MINHASH64)]))
        .alias("h", "sig"),
    ).select("doc_id", F.col("h").cast("int").alias("h"), "sig")

_PERM_VALUES = ",\n           ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(MINHASH64_AB))

SQL_MINHASH64_SIGNATURES = f"""
  SELECT t.doc_id, CAST(p.h AS INT) AS h,
         MIN((p.a * t.bm + p.b) % {MINHASH64_P}) AS sig
  FROM (
    SELECT d.doc_id,
           CAST(concat('0x', substr(md5(u.w), 1, 15)) AS BIGINT)
             % {MINHASH64_P} AS bm
    FROM documents d, UNNEST(string_split(d.text, ' ')) AS u(w)
  ) t,
  (VALUES {_PERM_VALUES}) AS p(h, a, b)
  GROUP BY t.doc_id, p.h
"""


def q_minhash64_signatures_fast(spark, sf_dir):
    """Production fast path for ``q_minhash64_signatures``: the token
    base hash is ``xxhash64`` (one 64-bit JVM hash, no md5 + hex-string
    + base-16 parse), everything else identical — 64 affine permuters
    as 64 min-aggs in one hash-agg pass. xxhash64 has no DuckDB
    equivalent, so this variant is benched (BENCH/BASELINE.md §7 A/B)
    rather than oracle-checked; the md5 variant stays the cross-engine
    parity surface. At 100 TB this is the one to run: the md5 path's
    only cost over it is the per-token digest."""
    d = load(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.array_distinct(_words())).alias("w")
    ).select("doc_id",
             F.pmod(F.xxhash64(F.col("w")),
                    F.lit(MINHASH64_P)).alias("bm"))
    aggs = [
        F.min((F.lit(a) * F.col("bm") + F.lit(b)) % F.lit(MINHASH64_P))
        .alias(f"s{i}")
        for i, (a, b) in enumerate(MINHASH64_AB)]
    wide = tokens.groupBy("doc_id").agg(*aggs)
    return wide.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"s{i}")
                               for i in range(N_MINHASH64)]))
        .alias("h", "sig"),
    ).select("doc_id", F.col("h").cast("int").alias("h"), "sig")


def q_jaccard_lsh_pairs(spark, sf_dir):
    """Jaccard near-dup edges blocked by MinHash-LSH bands (8 bands ×
    8 rows over the 64-perm signatures) instead of the ``source``
    column — cross-source near-dups become visible. Candidates are
    REPRESENTATIVE edges (each bucket member pairs with the bucket's
    min doc_id), not all intra-bucket pairs: on a dup-heavy corpus a
    single bucket can hold 30%+ of the docs and all-pairs goes
    quadratic (measured 9.8M pairs from 5k docs at sf0.1); rep edges
    keep the output O(n × bands) while still linking every near-dup to
    its cluster keeper — the shape a 100 TB dedup actually runs.
    Surviving edges are verified with exact token-set Jaccard ≥ 0.8.

    Bands come from ``_minhash64_bands`` (built on the wide signature
    row), so the plan shuffles tokens once and band buckets once —
    no 64-rows/doc reassembly exchange."""
    # materialize the band rows once (mins + candidate join both
    # consume them; the upstream md5 signature agg is the expensive part)
    bands = _minhash64_bands(spark, sf_dir).localCheckpoint(eager=True)
    mins = bands.groupBy("band_id", "band_value").agg(
        F.min("doc_id").alias("a"))
    cand = (
        bands.join(mins, ["band_id", "band_value"])
        .filter(F.col("doc_id") > F.col("a"))
        .select("a", F.col("doc_id").alias("b")).distinct()
    )
    # exact verify WITHOUT a token-level row explosion — shared
    # semi-pruned array_intersect stage (see _jaccard_verify)
    return _jaccard_verify(spark, sf_dir, cand)

SQL_JACCARD_LSH_PAIRS = f"""
  WITH sigs AS ({SQL_MINHASH64_SIGNATURES}),
  bands AS (
    SELECT doc_id, CAST(h // {MINHASH64_ROWS_PER_BAND} AS INT) AS band_id,
           string_agg(CAST(sig AS VARCHAR), '|' ORDER BY h) AS band_value
    FROM sigs GROUP BY doc_id, band_id
  ),
  mins AS (
    SELECT band_id, band_value, MIN(doc_id) AS a
    FROM bands GROUP BY band_id, band_value
  ),
  cand AS (
    SELECT DISTINCT m.a, x.doc_id AS b
    FROM bands x JOIN mins m
      ON x.band_id = m.band_id AND x.band_value = m.band_value
    WHERE x.doc_id > m.a
  ),
  tarr AS (
    SELECT doc_id, list_distinct(string_split(text, ' ')) AS ta
    FROM documents
  ),
  scored AS (
    SELECT c.a, c.b,
           len(list_intersect(x.ta, y.ta)) AS n_common,
           len(x.ta) AS sz_a, len(y.ta) AS sz_b
    FROM cand c
    JOIN tarr x ON x.doc_id = c.a
    JOIN tarr y ON y.doc_id = c.b
  )
  SELECT a, b, n_common,
         ROUND(CAST(n_common AS DOUBLE)
               / (sz_a + sz_b - n_common), 6) AS jaccard
  FROM scored
  WHERE n_common > 0
    AND ROUND(CAST(n_common AS DOUBLE)
              / (sz_a + sz_b - n_common), 6) >= 0.8
"""

SQL_JACCARD_NEAR_DUP = f"""
  WITH sigs AS ({SQL_MINHASH64_SIGNATURES}),
  bands AS (
    SELECT doc_id, CAST(h // {MINHASH64_ROWS_PER_BAND} AS INT) AS band_id,
           string_agg(CAST(sig AS VARCHAR), '|' ORDER BY h) AS band_value
    FROM sigs GROUP BY doc_id, band_id
  ),
  binfo AS (
    SELECT band_id, band_value, COUNT(*) AS bsz, MIN(doc_id) AS bmin
    FROM bands GROUP BY band_id, band_value
  ),
  bx AS (
    SELECT b.doc_id, b.band_id, b.band_value, i.bsz, i.bmin
    FROM bands b JOIN binfo i
      ON b.band_id = i.band_id AND b.band_value = i.band_value
  ),
  cand AS (
    SELECT DISTINCT a, b FROM (
      SELECT x.doc_id AS a, y.doc_id AS b
      FROM bx x JOIN bx y
        ON x.band_id = y.band_id AND x.band_value = y.band_value
      WHERE x.bsz <= {JACCARD_BUCKET_CAP} AND x.doc_id < y.doc_id
      UNION ALL
      SELECT bmin AS a, doc_id AS b
      FROM bx WHERE bsz > {JACCARD_BUCKET_CAP} AND doc_id > bmin
    )
  ),
  tarr AS (
    SELECT doc_id, list_distinct(string_split(text, ' ')) AS ta
    FROM documents
  ),
  scored AS (
    SELECT c.a, c.b,
           len(list_intersect(x.ta, y.ta)) AS n_common,
           len(x.ta) AS sz_a, len(y.ta) AS sz_b
    FROM cand c
    JOIN tarr x ON x.doc_id = c.a
    JOIN tarr y ON y.doc_id = c.b
  )
  SELECT a, b, n_common,
         ROUND(CAST(n_common AS DOUBLE)
               / (sz_a + sz_b - n_common), 6) AS jaccard
  FROM scored
  WHERE n_common > 0
    AND ROUND(CAST(n_common AS DOUBLE)
              / (sz_a + sz_b - n_common), 6) >= 0.8
"""


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------

def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y:
                   x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def _dotd(a, b):
    """Dot product over arrays already cast to double — for the
    per-pair hot path, where both sides pre-cast ONCE per row instead
    of 64 element casts per candidate pair. Bit-identical to ``_dot``
    on the same values (cast-then-multiply in either order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)


def _to_d(col):
    return F.transform(col, lambda x: x.cast("double"))


def q_ann_bruteforce_cosine(spark, sf_dir):
    """Brute-force cosine top-k (k=10) against the query vector
    vec_id=0: the exact baseline for ANN. The query vector broadcasts;
    the scan is embarrassingly parallel (no shuffle until top-k)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"))
    scored = (
        _spread(e).crossJoin(F.broadcast(q))
        .withColumn("dot", _dot(F.col("embedding"), F.col("qv")))
        .withColumn("na", F.sqrt(_dot(F.col("embedding"), F.col("embedding"))))
        .withColumn("nb", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
        .withColumn("cosine",
                    F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4))
        .filter(F.col("vec_id") != 0)
    )
    # parallel top-k (TakeOrderedAndProject), then rank the 10 survivors
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(10)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "vec_id", "label", "cosine")
    )

SQL_ANN_BRUTEFORCE = """
  WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
  scored AS (
    SELECT e.vec_id, e.label,
      ROUND(
        list_aggregate(list_transform(range(1, 65),
          i -> e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE), 'sum')
        / (SQRT(list_aggregate(list_transform(range(1, 65),
             i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), 'sum'))
         * SQRT(list_aggregate(list_transform(range(1, 65),
             i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE), 'sum'))), 4) AS cosine
    FROM embeddings e, q
    WHERE e.vec_id <> 0
  )
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank,
         vec_id, label, cosine
  FROM scored
  QUALIFY rank <= 10
"""


#: number of hyperplane-LSH bands (the recall knob: a near pair only
#: needs to agree in ONE band); FIXED — scale lives in the band width
HYPERPLANE_BANDS = 2


def _hp_band_width(n: int) -> int:
    """Per-band code width w = ~log2(corpus) sign bits: 2^w buckets per
    band keeps the expected same-bucket occupancy O(1) as n grows, so
    the per-band pair join stays O(n·bands). The WIDTH carries the
    scale (a fixed width ⇒ O(n²/2^w) ⇒ quadratic); the band COUNT is
    fixed and carries recall."""
    import math

    return max(4, math.ceil(math.log2(max(int(n), 2))))

#: DuckDB mirror of _hp_band_width(count(*)) — both engines derive the
#: identical (width, plane-count) from the same table
_SQL_HP_PARAMS = f"""
    SELECT CAST(GREATEST(4, CEIL(LOG2(GREATEST(COUNT(*), 2)))) AS INT)
             AS w,
           {HYPERPLANE_BANDS}
             * CAST(GREATEST(4, CEIL(LOG2(GREATEST(COUNT(*), 2))))
                    AS INT) AS p
    FROM embeddings
"""


def _hyperplane_buckets(spark, e):
    """(vec_id, band_id, bucket) from ``HYPERPLANE_BANDS`` bands of
    ``w = _hp_band_width(|e|)`` sign bits each (planes = the embeddings
    of vec_ids 1..bands·w — deterministic and derivable by both
    engines). The plane side is dimension-sized (broadcast); the bit
    votes aggregate with map-side combine on (vec_id, band_id)."""
    n = e.count()
    w = _hp_band_width(n)
    p = HYPERPLANE_BANDS * w
    planes = e.filter(F.col("vec_id").between(1, p)).select(
        F.col("vec_id").alias("plane_id"),
        _to_d(F.col("embedding")).alias("plane"))
    # pre-cast the vector once per ROW so the n×p sign hot loop is a
    # cast-free dot (identical value ⇒ identical sign bit)
    return (
        _spread(e.select("vec_id", _to_d(F.col("embedding")).alias("ev")))
        .crossJoin(F.broadcast(planes))
        .select(
            "vec_id",
            ((F.col("plane_id") - 1) / w).cast("int").alias("band_id"),
            (F.when(_dotd(F.col("ev"), F.col("plane")) > 0, 1)
             .otherwise(0)
             * F.pow(F.lit(2.0), (F.col("plane_id") - 1) % w)
             .cast("long")).alias("bitval"))
        .groupBy("vec_id", "band_id")
        .agg(F.sum("bitval").cast("long").alias("bucket"))
    )

_SQL_HP_BUCKETS = f"""
    SELECT e.vec_id,
           CAST((p.plane_id - 1) // p.w AS INT) AS band_id,
           CAST(SUM(
             (CASE WHEN list_aggregate(list_transform(range(1, 65),
               i -> e.embedding[i]::DOUBLE * p.plane[i]::DOUBLE), 'sum') > 0
               THEN 1 ELSE 0 END)
             * CAST(POW(2.0, (p.plane_id - 1) % p.w) AS BIGINT)
           ) AS BIGINT) AS bucket
    FROM embeddings e,
         (SELECT vec_id AS plane_id, embedding AS plane, params.w
          FROM embeddings, ({_SQL_HP_PARAMS}) params
          WHERE vec_id BETWEEN 1 AND params.p) p
    GROUP BY e.vec_id, band_id
"""


def q_ann_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH for ANN at scale: ``HYPERPLANE_BANDS``
    bands of w = ~log2(n) sign bits each (planes = embeddings of
    vec_ids 1..bands·w); reports per-(band, bucket) occupancy — the
    candidate sets a bucketed ANN probes. The band WIDTH grows with
    the corpus so expected bucket occupancy (and thus any same-bucket
    pair join) stays O(1)·bands at 100× the data; the fixed band count
    keeps recall (a near pair only needs to agree in ONE band)."""
    e = load(spark, sf_dir, "embeddings")
    return _hyperplane_buckets(spark, e).groupBy("band_id", "bucket").agg(
        F.count("*").alias("bucket_size"),
        F.min("vec_id").alias("min_vec_id"))

SQL_ANN_LSH_BUCKETS = f"""
  WITH bits AS ({_SQL_HP_BUCKETS})
  SELECT band_id, bucket, COUNT(*) AS bucket_size, MIN(vec_id) AS min_vec_id
  FROM bits GROUP BY band_id, bucket
"""


def q_embedding_centroids(spark, sf_dir):
    """Per-label centroid norms (embedding aggregation via posexplode —
    the map-side-combinable way to average vectors)."""
    e = load(spark, sf_dir, "embeddings")
    pos = _spread(e.select("label", "embedding")) \
        .select("label", F.posexplode("embedding").alias("i", "v"))
    cent = pos.groupBy("label", "i").agg(
        F.avg(F.col("v").cast("double")).alias("av"))
    return (
        cent.groupBy("label")
        .agg(F.round(F.sqrt(F.sum(F.col("av") * F.col("av"))), 4)
             .alias("centroid_norm"))
        .join(e.groupBy("label").agg(F.count("*").alias("n_vectors")),
              "label")
    )

SQL_EMBEDDING_CENTROIDS = """
  WITH cent AS (
    SELECT label, i, AVG(embedding[i + 1]::DOUBLE) AS av
    FROM embeddings, UNNEST(range(0, 64)) AS t(i)
    GROUP BY label, i
  ),
  norms AS (
    SELECT label, ROUND(SQRT(SUM(av * av)), 4) AS centroid_norm
    FROM cent GROUP BY label
  )
  SELECT n.label, n.centroid_norm, c.n_vectors
  FROM norms n JOIN (
    SELECT label, COUNT(*) AS n_vectors FROM embeddings GROUP BY label
  ) c ON n.label = c.label
"""


def q_ann_ivf(spark, sf_dir):
    """IVF (inverted-file) ANN — the scale path beyond brute force:
    (1) coarse quantizer = k ≈ √n cells seeded by a deterministic
        stride sample of the corpus (vec_ids 0, s, 2s, … with
        s = ⌊n/k⌋ — derivable identically by both engines, VERDICT
        r3 #6: the cell count scales with the corpus instead of the
        10 fixture labels),
    (2) every vector is assigned to its nearest cell by cosine,
    (3) the query (vec_id=0) probes the nprobe=3 nearest cells,
    (4) exact cosine top-10 *within the probed cells only*.
    At 100 TB the assignment is a broadcast join against k centroids
    (k=√n keeps both the centroid broadcast and the per-cell scan
    sublinear) and the search scans ~nprobe/√n of the corpus; writing
    the assigned table partitioned by ``cell`` makes a probe literal
    partition pruning — only the nprobe matching partitions are read."""
    import math

    e = load(spark, sf_dir, "embeddings")
    n = e.count()
    k = max(2, math.ceil(math.sqrt(n)))
    s = max(1, n // k)
    cent = (
        e.filter((F.col("vec_id") % s == 0)
                 & (F.col("vec_id") < k * s))
        .select((F.col("vec_id") / s).cast("int").alias("cell"),
                _to_d(F.col("embedding")).alias("cv"))
        .withColumn("cn", F.sqrt(_dotd(F.col("cv"), F.col("cv"))))
    )
    # (2) assign vectors to nearest cell (round-4 cosine, cell tiebreak).
    # Each side pre-casts its array and pre-computes its norm ONCE per
    # row, so the n×k pair hot loop is a single cast-free dot product
    # (bit-identical arithmetic, ~3× less array work per pair — the
    # r4 k=√n derivation made this loop n^1.5 and worth trimming)
    ev = (_spread(e.select("vec_id",
                           _to_d(F.col("embedding")).alias("ev")))
          .withColumn("en", F.sqrt(_dotd(F.col("ev"), F.col("ev")))))
    scored = (
        ev.crossJoin(F.broadcast(cent.select("cell", "cv", "cn")))
        .select("vec_id", "cell", F.round(
            _dotd(F.col("ev"), F.col("cv"))
            / (F.col("en") * F.col("cn")), 4).alias("cos"))
    )
    # argmax by (cos DESC, cell ASC) as a hash aggregation (max_by on
    # the (cos, -cell) struct): map-side combinable — at 10^10 vectors
    # a per-vector sort window would shuffle-sort the whole corpus,
    # while this aggregates partials per partition. Only the thin
    # (vec_id, cell, cos) rows flow through the argmax; the 64-float
    # payload joins back afterwards instead of riding n×k value structs
    cells = (
        scored.groupBy("vec_id")
        .agg(F.max_by(
            F.col("cell"),
            F.struct(F.col("cos"), (-F.col("cell")).alias("nc"))
        ).alias("cell"))
    )
    assigned = e.join(cells, "vec_id")
    # (3) probe cells: 3 nearest centroids to the query vector
    qv = (e.filter(F.col("vec_id") == 0)
          .select(_to_d(F.col("embedding")).alias("qv"))
          .withColumn("qn", F.sqrt(_dotd(F.col("qv"), F.col("qv")))))
    pw = Window.orderBy(F.desc("qcos"), F.asc("cell"))
    probed = (
        cent.crossJoin(F.broadcast(qv))
        .withColumn("qcos", F.round(
            _dotd(F.col("cv"), F.col("qv"))
            / (F.col("cn") * F.col("qn")), 4))
        .withColumn("prank", F.row_number().over(pw))
        .filter(F.col("prank") <= 3)
        .select("cell")
    )
    # (4) exact top-10 within the probed cells
    cand = (
        assigned.join(F.broadcast(probed), "cell")
        .filter(F.col("vec_id") != 0)
        .withColumn("xv", _to_d(F.col("embedding")))
        .crossJoin(F.broadcast(qv))
        .withColumn("cosine", F.round(
            _dotd(F.col("xv"), F.col("qv"))
            / (F.sqrt(_dotd(F.col("xv"), F.col("xv"))) * F.col("qn")), 4))
    )
    top = cand.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(10)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "vec_id", "label", "cell", "cosine")
    )

_SQL_COS = """
        list_aggregate(list_transform(range(1, 65),
          i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), 'sum')
        / (SQRT(list_aggregate(list_transform(range(1, 65),
             i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE), 'sum'))
         * SQRT(list_aggregate(list_transform(range(1, 65),
             i -> {b}[i]::DOUBLE * {b}[i]::DOUBLE), 'sum')))
"""

SQL_ANN_IVF = f"""
  WITH params AS (
    SELECT CAST(GREATEST(2, CEIL(SQRT(COUNT(*)))) AS BIGINT) AS k,
           GREATEST(1, COUNT(*)
             // CAST(GREATEST(2, CEIL(SQRT(COUNT(*)))) AS BIGINT)) AS s
    FROM embeddings
  ),
  cent AS (
    SELECT CAST(e.vec_id // p.s AS INT) AS cell,
           list_transform(e.embedding, x -> x::DOUBLE) AS cv
    FROM embeddings e, params p
    WHERE e.vec_id % p.s = 0 AND e.vec_id < p.k * p.s
  ),
  assigned AS (
    SELECT vec_id, label, embedding, cell
    FROM (
      SELECT e.vec_id, e.label, e.embedding, c.cell,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY ROUND({_SQL_COS.format(a='e.embedding', b='c.cv')}, 4)
                        DESC, c.cell) AS arank
      FROM embeddings e CROSS JOIN cent c
    ) WHERE arank = 1
  ),
  q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
  probed AS (
    SELECT cell FROM (
      SELECT c.cell,
             ROW_NUMBER() OVER (
               ORDER BY ROUND({_SQL_COS.format(a='c.cv', b='q.qv')}, 4)
                        DESC, c.cell) AS prank
      FROM cent c CROSS JOIN q
    ) WHERE prank <= 3
  )
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS BIGINT)
           AS rank,
         vec_id, label, cell, cosine
  FROM (
    SELECT a.vec_id, a.label, a.cell,
           ROUND({_SQL_COS.format(a='a.embedding', b='q.qv')}, 4) AS cosine
    FROM assigned a JOIN probed p ON a.cell = p.cell CROSS JOIN q
    WHERE a.vec_id <> 0
  )
  QUALIFY rank <= 10
"""


def _ivf_assign(ev, cent):
    """Nearest-cell assignment (cos DESC, cell ASC tiebreak) as a
    map-side-combinable max_by hash agg — identical numerics to
    q_ann_ivf's step (2)."""
    scored = (
        ev.crossJoin(F.broadcast(cent.select("cell", "cv", "cn")))
        .select("vec_id", "cell", F.round(
            _dotd(F.col("ev"), F.col("cv"))
            / (F.col("en") * F.col("cn")), 4).alias("cos"))
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.max_by(
            F.col("cell"),
            F.struct(F.col("cos"), (-F.col("cell")).alias("nc"))
        ).alias("cell"))
    )


def _lloyd_update(ev, cells):
    """One Lloyd step: new centroid = per-dimension mean of the cell's
    members (posexplode + groupBy(cell, i) avg — the map-side-
    combinable vector average from q_embedding_centroids), components
    rounded to 6 so both engines quantize identically. Cells that
    lost all members drop out (both engines group over the same
    assignment)."""
    pos = ev.join(cells, "vec_id").select(
        "cell", F.posexplode("ev").alias("i", "v"))
    return (
        pos.groupBy("cell", "i")
        .agg(F.round(F.avg("v"), 6).alias("av"))
        .groupBy("cell")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("i", "av"))),
            lambda x: x["av"]).alias("cv"))
        .withColumn("cn", F.sqrt(_dotd(F.col("cv"), F.col("cv"))))
    )


def _ivf_quantizer(e, iters=0):
    """Build the coarse quantizer (stride-seeded k≈√n cells + ``iters``
    Lloyd refinements) and assign every vector. Returns (cent, cells):
    cent = (cell, cv, cn) k-row DataFrame, cells = (vec_id, cell)."""
    n = e.count()
    k = max(2, math.ceil(math.sqrt(n)))
    s = max(1, n // k)
    ev = (_spread(e.select("vec_id",
                           _to_d(F.col("embedding")).alias("ev")))
          .withColumn("en", F.sqrt(_dotd(F.col("ev"), F.col("ev")))))
    cent = (
        e.filter((F.col("vec_id") % s == 0)
                 & (F.col("vec_id") < k * s))
        .select((F.col("vec_id") / s).cast("int").alias("cell"),
                _to_d(F.col("embedding")).alias("cv"))
        .withColumn("cn", F.sqrt(_dotd(F.col("cv"), F.col("cv"))))
    )
    for _ in range(iters):
        # materialize each refinement so plans don't stack across
        # iterations (k rows — trivially cacheable at any scale)
        cent = _lloyd_update(ev, _ivf_assign(ev, cent)).cache()
    return cent, _ivf_assign(ev, cent)


def build_ivf_index(e, path, iters=2):
    """Materialize the IVF index the way a 100-TB deployment would:
    assign every vector to its (Lloyd-refined) cell and write the
    corpus parquet PARTITIONED BY cell, so a probe's ``cell IN (…)``
    filter becomes literal partition pruning — only the nprobe
    matching directories are ever read (pinned by
    tests/test_ivf_index.py on the executed plan's PartitionFilters).
    Returns the centroid DataFrame (cell, cv, cn) — the k-row
    dimension a query planner keeps resident to pick probe cells."""
    cent, cells = _ivf_quantizer(e, iters)
    e.join(cells, "vec_id").write.mode("overwrite") \
        .partitionBy("cell").parquet(path)
    return cent


def probe_ivf_index(spark, path, cent, nprobe=3, topk=10):
    """Top-k search against a materialized IVF index (build_ivf_index):
    rank cells by centroid cosine vs the query (vec_id=0 read from the
    index itself), collect the nprobe winning cell IDs (k-row
    dimension — legitimately driver-sized at any corpus scale), and
    scan ONLY those partitions with an ``isin`` literal filter. Same
    ranking semantics as ivf_topk; the difference is the scan reads
    nprobe/k of the data instead of filtering it after a full read."""
    idx = spark.read.parquet(path)
    qv = (idx.filter(F.col("vec_id") == 0)
          .select(_to_d(F.col("embedding")).alias("qv"))
          .withColumn("qn", F.sqrt(_dotd(F.col("qv"), F.col("qv")))))
    pw = Window.orderBy(F.desc("qcos"), F.asc("cell"))
    probe_cells = [
        r["cell"] for r in (
            cent.crossJoin(F.broadcast(qv))
            .withColumn("qcos", F.round(
                _dotd(F.col("cv"), F.col("qv"))
                / (F.col("cn") * F.col("qn")), 4))
            .withColumn("prank", F.row_number().over(pw))
            .filter(F.col("prank") <= nprobe)
            .select("cell").collect())
    ]
    cand = (
        idx.filter(F.col("cell").isin(probe_cells))
        .filter(F.col("vec_id") != 0)
        .withColumn("xv", _to_d(F.col("embedding")))
        .crossJoin(F.broadcast(qv))
        .withColumn("cosine", F.round(
            _dotd(F.col("xv"), F.col("qv"))
            / (F.sqrt(_dotd(F.col("xv"), F.col("xv"))) * F.col("qn")), 4))
    )
    top = cand.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(topk)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "vec_id", "label", "cell", "cosine")
    )


def ivf_topk(e, iters=0, nprobe=3, topk=10):
    """IVF search over an embeddings DataFrame with ``iters`` Lloyd
    refinements of the stride-seeded k≈√n coarse quantizer.

    iters=0 is exactly q_ann_ivf's scheme. Each Lloyd iteration is two
    distributed jobs — a broadcast-join assignment (n×k thin rows,
    max_by hash agg) and a posexplode per-dimension mean — so the
    refinement costs O(iters·n·k) with NO driver-side data: centroids
    stay a k-row DataFrame that re-broadcasts each pass. Measured on
    planted-cluster corpora (BENCH/ann_recall_r4.json + scripts/
    ann_recall.py): 2 iterations lift recall@10 at nprobe=3 from
    0.50-0.71 (stride seeds) to 1.00 while SHRINKING the scanned
    fraction (~9% → ~6%) — tighter cells both find the neighbors and
    prune better. On isotropic noise recall stays ~0.3 at any iters:
    no quantizer can beat the d=64 concentration of measure, which is
    why the recall evidence uses clustered corpora (where real text
    embeddings live)."""
    cent, cells = _ivf_quantizer(e, iters)
    assigned = e.join(cells, "vec_id")
    qv = (e.filter(F.col("vec_id") == 0)
          .select(_to_d(F.col("embedding")).alias("qv"))
          .withColumn("qn", F.sqrt(_dotd(F.col("qv"), F.col("qv")))))
    pw = Window.orderBy(F.desc("qcos"), F.asc("cell"))
    probed = (
        cent.crossJoin(F.broadcast(qv))
        .withColumn("qcos", F.round(
            _dotd(F.col("cv"), F.col("qv"))
            / (F.col("cn") * F.col("qn")), 4))
        .withColumn("prank", F.row_number().over(pw))
        .filter(F.col("prank") <= nprobe)
        .select("cell")
    )
    cand = (
        assigned.join(F.broadcast(probed), "cell")
        .filter(F.col("vec_id") != 0)
        .withColumn("xv", _to_d(F.col("embedding")))
        .crossJoin(F.broadcast(qv))
        .withColumn("cosine", F.round(
            _dotd(F.col("xv"), F.col("qv"))
            / (F.sqrt(_dotd(F.col("xv"), F.col("xv"))) * F.col("qn")), 4))
    )
    top = cand.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(topk)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "vec_id", "label", "cell", "cosine")
    )


def q_ann_ivf_lloyd(spark, sf_dir):
    """IVF with 2 Lloyd refinements of the coarse quantizer — the
    recall-quality production variant of q_ann_ivf (see ivf_topk)."""
    return ivf_topk(load(spark, sf_dir, "embeddings"), iters=2)


def _sql_lloyd_assign(cent_cte):
    return f"""
    SELECT vec_id, cell FROM (
      SELECT e.vec_id, c.cell,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY ROUND({_SQL_COS.format(a='e.embedding', b='c.cv')}, 4)
                        DESC, c.cell) AS arank
      FROM embeddings e CROSS JOIN {cent_cte} c
    ) WHERE arank = 1
  """


def _sql_lloyd_cent(assign_cte):
    return f"""
    SELECT cell, list(av ORDER BY i) AS cv FROM (
      SELECT a.cell, t.i,
             ROUND(AVG(e.embedding[t.i + 1]::DOUBLE), 6) AS av
      FROM {assign_cte} a JOIN embeddings e USING (vec_id),
           UNNEST(range(0, 64)) AS t(i)
      GROUP BY a.cell, t.i
    ) GROUP BY cell
  """


SQL_ANN_IVF_LLOYD = f"""
  WITH params AS (
    SELECT CAST(GREATEST(2, CEIL(SQRT(COUNT(*)))) AS BIGINT) AS k,
           GREATEST(1, COUNT(*)
             // CAST(GREATEST(2, CEIL(SQRT(COUNT(*)))) AS BIGINT)) AS s
    FROM embeddings
  ),
  cent0 AS (
    SELECT CAST(e.vec_id // p.s AS INT) AS cell,
           list_transform(e.embedding, x -> x::DOUBLE) AS cv
    FROM embeddings e, params p
    WHERE e.vec_id % p.s = 0 AND e.vec_id < p.k * p.s
  ),
  a1 AS ({_sql_lloyd_assign('cent0')}),
  cent1 AS ({_sql_lloyd_cent('a1')}),
  a2 AS ({_sql_lloyd_assign('cent1')}),
  cent2 AS ({_sql_lloyd_cent('a2')}),
  a3 AS ({_sql_lloyd_assign('cent2')}),
  assigned AS (
    SELECT e.vec_id, e.label, e.embedding, a.cell
    FROM embeddings e JOIN a3 a USING (vec_id)
  ),
  q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
  probed AS (
    SELECT cell FROM (
      SELECT c.cell,
             ROW_NUMBER() OVER (
               ORDER BY ROUND({_SQL_COS.format(a='c.cv', b='q.qv')}, 4)
                        DESC, c.cell) AS prank
      FROM cent2 c CROSS JOIN q
    ) WHERE prank <= 3
  )
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS BIGINT)
           AS rank,
         vec_id, label, cell, cosine
  FROM (
    SELECT a.vec_id, a.label, a.cell,
           ROUND({_SQL_COS.format(a='a.embedding', b='q.qv')}, 4) AS cosine
    FROM assigned a JOIN probed p ON a.cell = p.cell CROSS JOIN q
    WHERE a.vec_id <> 0
  )
  QUALIFY rank <= 10
"""


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate detection, banded-LSH-blocked:
    ``HYPERPLANE_BANDS`` bands of w = ~log2(n) hyperplane sign bits
    each (the ``_hyperplane_buckets`` scheme — the band WIDTH grows
    with the corpus so EXPECTED same-bucket occupancy stays O(1));
    candidate pairs share a bucket in ANY band (the fixed band count
    keeps recall), deduped, then exact cosine ≥ 0.2 verifies.

    Banding bounds only the EXPECTED occupancy: a genuine dup cluster
    (near-identical embeddings) lands in ONE bucket at any width, so
    the intra-bucket join is additionally capped like
    ``q_jaccard_near_dup`` (VERDICT r3 #5): buckets up to
    ``JACCARD_BUCKET_CAP`` members emit all pairs; larger buckets emit
    representative member→bucket-min keeper edges (O(n) — a bucket
    that large IS one dup cluster, and the keeper edge is what dedup
    consumes). Worst-case candidate volume is O(n·bands) regardless of
    how duplicated the corpus is — the 100-TB near-dup plan."""
    e = load(spark, sf_dir, "embeddings")
    sig = _hyperplane_buckets(spark, e)
    cap = JACCARD_BUCKET_CAP
    # bucket occupancy (bsz) + representative (bmin) as WINDOW aggs
    # over the one (band_id, bucket) exchange — the old
    # groupBy + self-join shape shuffled the signature twice and
    # re-derived the n*p hyperplane scan per consumer; bx then
    # materializes ONCE (three consumers: both small-pair sides and
    # the keeper-edge branch)
    wb = Window.partitionBy("band_id", "bucket")
    bx = (sig.withColumn("bsz", F.count("*").over(wb))
          .withColumn("bmin", F.min("vec_id").over(wb))
          .localCheckpoint(eager=True))
    small = bx.filter(F.col("bsz") <= cap)
    pairs_small = (
        small.select("band_id", "bucket", F.col("vec_id").alias("a_id"))
        .join(small.select("band_id", "bucket",
                           F.col("vec_id").alias("b_id")),
              ["band_id", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
    )
    pairs_large = (
        bx.filter((F.col("bsz") > cap) & (F.col("vec_id") > F.col("bmin")))
        .select(F.col("bmin").alias("a_id"), F.col("vec_id").alias("b_id"))
    )
    cand = pairs_small.unionByName(pairs_large).distinct()
    # each side pre-casts + pre-norms once per VECTOR (n rows), so the
    # per-CANDIDATE verify is one cast-free dot (bit-identical values)
    va = e.select(F.col("vec_id").alias("a_id"),
                  _to_d(F.col("embedding")).alias("a_emb")) \
        .withColumn("a_n", F.sqrt(_dotd(F.col("a_emb"), F.col("a_emb"))))
    vb = e.select(F.col("vec_id").alias("b_id"),
                  _to_d(F.col("embedding")).alias("b_emb")) \
        .withColumn("b_n", F.sqrt(_dotd(F.col("b_emb"), F.col("b_emb"))))
    return (
        cand.join(va, "a_id").join(vb, "b_id")
        .withColumn("cosine", F.round(
            _dotd(F.col("a_emb"), F.col("b_emb"))
            / (F.col("a_n") * F.col("b_n")), 4))
        .filter(F.col("cosine") >= 0.2)
        .select("a_id", "b_id", "cosine")
    )

SQL_EMBEDDING_NEAR_DUP = f"""
  WITH bits AS ({_SQL_HP_BUCKETS}),
  binfo AS (
    SELECT band_id, bucket, COUNT(*) AS bsz, MIN(vec_id) AS bmin
    FROM bits GROUP BY band_id, bucket
  ),
  bx AS (
    SELECT b.vec_id, b.band_id, b.bucket, i.bsz, i.bmin
    FROM bits b JOIN binfo i
      ON b.band_id = i.band_id AND b.bucket = i.bucket
  ),
  cand AS (
    SELECT DISTINCT a_id, b_id FROM (
      SELECT x.vec_id AS a_id, y.vec_id AS b_id
      FROM bx x JOIN bx y
        ON x.band_id = y.band_id AND x.bucket = y.bucket
      WHERE x.bsz <= {JACCARD_BUCKET_CAP} AND x.vec_id < y.vec_id
      UNION ALL
      SELECT bmin AS a_id, vec_id AS b_id
      FROM bx WHERE bsz > {JACCARD_BUCKET_CAP} AND vec_id > bmin
    )
  )
  SELECT c.a_id, c.b_id,
         ROUND({_SQL_COS.format(a='a.embedding', b='b.embedding')}, 4)
           AS cosine
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.a_id
  JOIN embeddings b ON b.vec_id = c.b_id
  WHERE ROUND({_SQL_COS.format(a='a.embedding', b='b.embedding')}, 4) >= 0.2
"""


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

#: GPT-2-style pre-tokenizer regex (ASCII subset): contraction
#: suffixes, space-prefixed letter runs / digit runs / punctuation
#: runs, residual whitespace. No lookarounds, so the Java (Spark) and
#: RE2 (DuckDB) engines match it identically — parity-tested on
#: punctuation/contraction/empty edge cases
BPE_TOKEN_PATTERN = \
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def q_token_count(spark, sf_dir):
    """Token counting both ways a pipeline budget needs: whitespace
    words (the corpus-stats convention) and a BPE-ish pre-tokenizer
    segment count (the LLM-cost convention — GPT-2's pre-tokenize
    split, which upper-bounds the merged BPE token count). Both are
    single-pass JVM expressions over the text column, no UDF."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_words()).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(
            F.col("text"), F.lit(BPE_TOKEN_PATTERN), 0))
        .cast("long").alias("n_bpe_tokens"),
        F.col("n_chars").alias("n_chars"),
    )

SQL_TOKEN_COUNT = f"""
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(text,
           '{BPE_TOKEN_PATTERN.replace("'", "''")}')) AS BIGINT)
           AS n_bpe_tokens,
         n_chars
  FROM documents
"""


def q_quality_score(spark, sf_dir):
    """Quality scoring (length + stopword-ratio features — the
    C4/Gopher-style heuristics over the documents table)."""
    d = load(spark, sf_dir, "documents")
    words = _words()
    n_tokens = F.size(words).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w))) \
        .cast("double")
    avg_wlen = (F.length("text") - (F.size(words) - 1)) / F.size(words)
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_tokens"),
        F.round(n_stop / n_tokens, 6).alias("stopword_ratio"),
        F.round(avg_wlen, 6).alias("avg_word_len"),
        (F.size(words) >= 10).alias("passes_min_len"),
    )

SQL_QUALITY_SCORE = f"""
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ROUND(CAST(len(list_filter(string_split(text, ' '),
                w -> w IN ({_SQL_STOPWORDS}))) AS DOUBLE)
               / len(string_split(text, ' ')), 6) AS stopword_ratio,
         ROUND(CAST(LENGTH(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
               / len(string_split(text, ' ')), 6) AS avg_word_len,
         len(string_split(text, ' ')) >= 10 AS passes_min_len
  FROM documents
"""


#: char-trigram profiles per language (the n-gram-profile method of
#: Cavnar & Trenkle 1994 / textcat, reduced to the highest-frequency
#: trigrams of each language — public linguistic knowledge). Scores
#: are integer occurrence counts so Spark/DuckDB hash-parity is exact.
#: A doc whose bounded prefix contains NO profile trigram is 'unknown'.
LANG_TRIGRAMS = {
    "en": (" th", "the", "he ", "ing", "ng ", "and", "nd ", " an",
           " of", "of ", " to", "to ", "ed ", " in", "ion", "ent"),
    "es": (" de", "de ", " la", "la ", "os ", " el", "el ", "que",
           " qu", "ue ", "as ", "ón ", " es", "es ", "ar ", "ado"),
    "de": ("en ", "er ", "der", "ch ", "sch", "ich", "die", "ie ",
           "und", "ein", "ung", "gen", "ten", " un", " di", "cht"),
    "fr": ("le ", " le", "es ", "ent", " et", "et ", " la", "les",
           "re ", "eur", "ait", "ais", "ou ", " pa", "our", "qu'"),
}
for _gs in LANG_TRIGRAMS.values():
    assert len(set(_gs)) == len(_gs), "duplicate trigram in a profile"
#: classify on a bounded prefix: cost per doc is O(1) regardless of
#: document size (the standard langid trick — 256 chars carry the
#: trigram signal), so the explode below is ≤254 rows/doc at 100 TB
LANG_ID_PREFIX = 256


def q_lang_id(spark, sf_dir):
    """Language-ID by char-trigram profile voting, compared against
    the declared lang tag; reports the confusion histogram.

    Shape at 100 TB: ONE corpus scan, ZERO data shuffles — the
    per-language scores are computed ROW-LOCALLY as
    ``size(filter(tris, t -> t IN profile_lang))`` (4 langs × 16
    literal trigrams, pure JVM ``In`` predicates over the ≤254-element
    bounded trigram array) and the argmax is a per-row ``when`` ladder
    (score DESC, lang ASC tiebreak, exactly the old window order).
    The only exchange left is the 4×5-row confusion-histogram agg.
    The previous shape — explode (≤254 rows/doc) → broadcast profile
    join → two doc-keyed shuffles → corpus-wide left join — computed
    the identical answer with 4 exchanges and a SortMergeJoin
    (measured 7.3 s vs its peers' 0.2–2 s at sf0.1; the r5 verdict's
    one `weak` plan). A (doc, plang) score row only ever existed when
    score ≥ 1, so `max score == 0 → 'unknown'` reproduces the old
    left-join-null path bit-for-bit.

    Staging discipline: ``tris`` is materialized as an attribute of a
    child projection before the 4 lambda filters reference it (no CSE
    inside higher-order functions — the _shingles_col rule), and the
    scores/max are attributes before the argmax ladder reads them."""
    d = load(spark, sf_dir, "documents")
    langs = sorted(LANG_TRIGRAMS)
    t = F.lower(F.substring(F.col("text"), 1, LANG_ID_PREFIX))
    # spread AFTER projecting to (declared, 256-char prefix): the
    # exchange moves only the bytes the scorer needs (guide §2.3)
    d2 = _spread(d.select(F.col("lang").alias("declared"), t.alias("t")))
    tris = F.when(
        F.length("t") >= 3,
        F.expr("transform(sequence(1, length(t) - 2),"
               " i -> substring(t, i, 3))")
    ).otherwise(F.expr("cast(array() as array<string>)"))
    d3 = d2.select("declared", tris.alias("tris"))

    def _in_profile(gs):
        # single-arg lambda (pyspark dispatches on arity) over literal
        # trigrams — compiles to a JVM In predicate, no array capture
        return lambda x: x.isin(*gs)

    scored = d3.select(
        "declared",
        *[F.size(F.filter(F.col("tris"), _in_profile(LANG_TRIGRAMS[lg])))
          .alias(f"s_{lg}") for lg in langs])
    staged = scored.select(
        "declared", *[f"s_{lg}" for lg in langs],
        F.greatest(*[F.col(f"s_{lg}") for lg in langs]).alias("mx"))
    pred = F.when(F.col("mx") <= 0, F.lit("unknown"))
    for lg in langs:  # first lang hitting the max = (score DESC, lang ASC)
        pred = pred.when(F.col(f"s_{lg}") == F.col("mx"), F.lit(lg))
    return (
        staged.select("declared",
                      pred.otherwise(F.lit("unknown")).alias("predicted"))
        .groupBy("declared", "predicted")
        .agg(F.count("*").alias("n"))
    )

_SQL_LANG_PROFILE = ",\n      ".join(
    f"('{lang}', '{g.replace(chr(39), chr(39) * 2)}')"
    for lang, gs in sorted(LANG_TRIGRAMS.items()) for g in gs)

SQL_LANG_ID = f"""
  WITH t AS (
    SELECT doc_id, lang AS declared,
           lower(substr(text, 1, {LANG_ID_PREFIX})) AS t
    FROM documents
  ),
  tri AS (
    SELECT doc_id, substr(t.t, CAST(u.i AS INTEGER), 3) AS tri
    FROM t, UNNEST(range(1, GREATEST(length(t.t) - 1, 1))) AS u(i)
  ),
  prof(plang, tri) AS (VALUES
      {_SQL_LANG_PROFILE}),
  sc AS (
    SELECT doc_id, plang, COUNT(*) AS score
    FROM tri JOIN prof USING (tri) GROUP BY 1, 2
  ),
  best AS (
    SELECT doc_id, plang FROM (
      SELECT doc_id, plang,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, plang) AS rn
      FROM sc) WHERE rn = 1
  )
  SELECT t.declared, COALESCE(b.plang, 'unknown') AS predicted,
         COUNT(*) AS n
  FROM t LEFT JOIN best b USING (doc_id)
  GROUP BY 1, 2
"""


def q_text_stats(spark, sf_dir):
    """token_count + quality_score fused into ONE projection over ONE
    corpus scan (they share the doc_id grain and most of their
    sub-expressions — at 100 TB two scans of the text column for two
    per-doc stat families is pure waste). Union of both schemas; the
    raw variants stay for bench comparability.

    Also carries the Gopher-style repetition signals (Rae et al. 2021
    §A1.1, the "repetition removal" quality filters): the share of
    2-gram occurrences taken by the single most frequent 2-gram
    (`top2gram_share`) and the share of 2-gram occurrences whose gram
    appears more than once (`dup_2gram_share`). Both come from ONE
    per-row run-length scan over the sorted shingle array (array_sort
    + F.aggregate, pure JVM): O(len·log len) per row, no per-gram
    groupBy — a corpus-wide explode+count for a per-document statistic
    would shuffle the whole corpus for no reason."""
    d = load(spark, sf_dir, "documents")
    # stage the words array as an attribute: _shingles_col lambdas
    # re-evaluate captured non-attribute expressions per element
    base = _spread(d.select("doc_id", "text", "n_chars")) \
        .select("doc_id", "text", "n_chars", _words().alias("w"))
    w = F.col("w")
    n_tokens = F.size(w).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(w, lambda t: F.array_contains(stop_arr, t))) \
        .cast("double")
    avg_wlen = (F.length("text") - (F.size(w) - 1)) / F.size(w)
    sh = F.array_sort(_shingles_col(w, k=2))
    zero = F.lit(0).cast("long")
    rep_scan = F.aggregate(
        sh,
        F.struct(F.lit("").alias("prev"), zero.alias("run"),
                 zero.alias("best"), zero.alias("dup")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(x == acc["prev"], acc["best"])
            .otherwise(F.greatest(acc["best"], acc["run"])).alias("best"),
            F.when(x == acc["prev"], acc["dup"])
            .otherwise(acc["dup"] + F.when(acc["run"] > 1, acc["run"])
                       .otherwise(zero)).alias("dup"),
        ),
        lambda acc: F.struct(
            F.greatest(acc["best"], acc["run"]).alias("best"),
            (acc["dup"] + F.when(acc["run"] > 1, acc["run"])
             .otherwise(zero)).alias("dup"),
        ),
    )
    staged = base.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.size(F.regexp_extract_all(
            F.col("text"), F.lit(BPE_TOKEN_PATTERN), 0))
        .cast("long").alias("n_bpe_tokens"),
        F.col("n_chars").alias("n_chars"),
        F.round(n_stop / n_tokens.cast("double"), 6).alias("stopword_ratio"),
        F.round(avg_wlen, 6).alias("avg_word_len"),
        (F.size(w) >= 10).alias("passes_min_len"),
        F.size(sh).cast("long").alias("n_2grams"),
        rep_scan.alias("_rep"),
    )
    n2 = F.col("n_2grams")
    return staged.select(
        "doc_id", "n_tokens", "n_bpe_tokens", "n_chars", "stopword_ratio",
        "avg_word_len", "passes_min_len", "n_2grams",
        F.when(n2 > 0, F.round(
            F.col("_rep.best").cast("double") / n2.cast("double"), 6))
        .alias("top2gram_share"),
        F.when(n2 > 0, F.round(
            F.col("_rep.dup").cast("double") / n2.cast("double"), 6))
        .alias("dup_2gram_share"),
    )

SQL_TEXT_STATS = f"""
  WITH w AS (
    SELECT doc_id, text, n_chars, string_split(text, ' ') AS w
    FROM documents
  ),
  sh AS (
    SELECT doc_id,
           CASE WHEN len(w) >= 2 THEN
             list_transform(range(1, len(w)),
                            i -> concat(w[i], ' ', w[i + 1]))
           ELSE [] END AS sh
    FROM w
  ),
  cnt AS (
    SELECT doc_id, u.g, COUNT(*) AS c
    FROM sh, UNNEST(sh.sh) AS u(g)
    GROUP BY doc_id, u.g
  ),
  rep AS (
    SELECT doc_id,
           MAX(c) AS best,
           SUM(c) AS tot,
           COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS dup
    FROM cnt GROUP BY doc_id
  )
  SELECT w.doc_id,
         CAST(len(w.w) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(w.text,
           '{BPE_TOKEN_PATTERN.replace("'", "''")}')) AS BIGINT)
           AS n_bpe_tokens,
         w.n_chars,
         ROUND(CAST(len(list_filter(w.w,
                t -> t IN ({_SQL_STOPWORDS}))) AS DOUBLE)
               / len(w.w), 6) AS stopword_ratio,
         ROUND(CAST(LENGTH(w.text) - (len(w.w) - 1) AS DOUBLE)
               / len(w.w), 6) AS avg_word_len,
         len(w.w) >= 10 AS passes_min_len,
         CAST(len(sh.sh) AS BIGINT) AS n_2grams,
         ROUND(CAST(rep.best AS DOUBLE) / rep.tot, 6) AS top2gram_share,
         ROUND(CAST(rep.dup AS DOUBLE) / rep.tot, 6) AS dup_2gram_share
  FROM w
  JOIN sh USING (doc_id)
  LEFT JOIN rep USING (doc_id)
"""


#: decontamination n-gram width (the 13-gram convention from the
#: GPT-3/PaLM decontamination appendices) and the deterministic eval
#: split (stand-in for a benchmark table: docs with doc_id % 10 == 0)
DECON_N = 13
DECON_EVAL_MOD = 10
#: eval-gram broadcast gate (distinct eval grams above this join
#: shuffled instead of broadcast)
DECON_BCAST_LIMIT = 5_000_000


def q_decontaminate(spark, sf_dir):
    """Training-data decontamination: flag every (train doc, eval doc)
    pair sharing at least one 13-word n-gram, with the count of shared
    distinct n-grams. The eval split is deterministic (doc_id % 10 ==
    0) standing in for a benchmark table. Scale shape: grams hash to
    int64 through the cross-engine md5 base hash so only 8-byte keys
    move; real eval sets are tiny, so the eval gram→doc map broadcasts
    (size-gated like the engine's dimension sides) and the corpus-side
    scan NEVER shuffles — the only shuffle is the final groupBy over
    hits, which is contamination-sized, not corpus-sized."""
    d = _spread(load(spark, sf_dir, "documents")
                .select("doc_id", "text"))
    grams = (
        d.select("doc_id", _words().alias("w_arr"))
        .select("doc_id",
                _shingles_col(F.col("w_arr"), k=DECON_N).alias("sh"))
        # explode_outer + null filter: same InferFiltersFromGenerate
        # pushdown hazard as q_winnow_fingerprint
        .select("doc_id", F.explode_outer("sh").alias("g"))
        .filter(F.col("g").isNotNull())
        .select("doc_id", _token_base_col(F.col("g")).alias("gm")))
    ev = (grams.filter(F.col("doc_id") % DECON_EVAL_MOD == 0)
          .select(F.col("doc_id").alias("eval_doc_id"), "gm")
          .distinct())
    # train side stays duplicate-gram'd (no corpus-wide distinct
    # shuffle); countDistinct after the hit join dedups instead
    tr = grams.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
    # materialize the eval-gram derivation ONCE: without the
    # checkpoint the gate count and the join job each re-run the
    # eval side's shingle-explode pipeline (the dominant scan this
    # operator's 100-TB budget counts once)
    ev = ev.localCheckpoint(eager=True)
    ev_side = F.broadcast(ev) if ev.count() <= DECON_BCAST_LIMIT else ev
    return (tr.join(ev_side, "gm")
            .groupBy("doc_id", "eval_doc_id")
            .agg(F.countDistinct("gm").alias("n_shared_ngrams")))

SQL_DECONTAMINATE = f"""
  WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
  sh AS (
    SELECT doc_id,
           CASE WHEN len(w) >= {DECON_N} THEN
             list_transform(range(1, len(w) - {DECON_N - 2}),
                            i -> array_to_string(w[i:i + {DECON_N - 1}], ' '))
           ELSE [] END AS sh
    FROM w
  ),
  grams AS (
    SELECT doc_id,
           CAST(concat('0x', substr(md5(u.g), 1, 15)) AS BIGINT)
             % {MINHASH64_P} AS gm
    FROM sh, UNNEST(sh.sh) AS u(g)
  ),
  ev AS (
    SELECT DISTINCT doc_id AS eval_doc_id, gm FROM grams
    WHERE doc_id % {DECON_EVAL_MOD} = 0
  ),
  tr AS (
    SELECT doc_id, gm FROM grams WHERE doc_id % {DECON_EVAL_MOD} <> 0
  )
  SELECT t.doc_id, e.eval_doc_id,
         COUNT(DISTINCT t.gm) AS n_shared_ngrams
  FROM tr t JOIN ev e USING (gm)
  GROUP BY t.doc_id, e.eval_doc_id
"""


def q_doc_fingerprint(spark, sf_dir):
    """Document fingerprinting: md5 of whitespace-normalized lowercase
    text + duplicate-group stats."""
    d = load(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.col("text"), "\\s+", " "))
    return (
        d.withColumn("fingerprint", F.md5(norm.cast("binary")))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("group_size"),
             F.min("doc_id").alias("min_doc_id"))
    )

SQL_DOC_FINGERPRINT = """
  SELECT md5(LOWER(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
         COUNT(*) AS group_size, MIN(doc_id) AS min_doc_id
  FROM documents GROUP BY 1
"""


#: passage-dedup segment width (words): non-overlapping spans, the
#: exact-substring-dedup approximation (Lee et al., "Deduplicating
#: Training Data Makes Language Models Better" dedups ~50-token spans;
#: 16 words matches this corpus's short synthetic docs)
SEGMENT_WORDS = 16


def q_segment_dedup(spark, sf_dir):
    """Passage-level exact dedup: split each document into
    non-overlapping ``SEGMENT_WORDS``-word segments (trailing partial
    kept), hash each, group across the corpus. Catches boilerplate /
    quoted passages that whole-document hashing misses and winnowing
    only flags probabilistically. One explode + one map-side-
    combinable hash-agg — at 100 TB the segment rows shuffle once on
    the (uniform) md5 key and partial-aggregate per partition, so the
    cost is a single pass over the corpus regardless of duplication."""
    d = load(spark, sf_dir, "documents")
    w = _words()
    n_seg = F.ceil(F.size(w) / SEGMENT_WORDS).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(
            F.slice(w, i * SEGMENT_WORDS + 1, SEGMENT_WORDS), " "))
    return (
        d.select("doc_id", F.explode(segs).alias("segment"))
        .withColumn("fingerprint",
                    F.md5(F.col("segment").cast("binary")))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("group_size"),
             F.min("doc_id").alias("min_doc_id"))
    )

SQL_SEGMENT_DEDUP = f"""
  SELECT fingerprint, COUNT(*) AS group_size, MIN(doc_id) AS min_doc_id
  FROM (
    SELECT d.doc_id,
           md5(array_to_string(
             d.w[t.i * {SEGMENT_WORDS} + 1 : (t.i + 1) * {SEGMENT_WORDS}],
             ' ')) AS fingerprint
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d,
         UNNEST(range(0, CAST(CEIL(len(d.w)::DOUBLE / {SEGMENT_WORDS})
                              AS BIGINT))) AS t(i)
  ) GROUP BY 1
"""


# ---------------------------------------------------------------------------
# multimodal binary-column plumbing (decode stubbed per environment)
# ---------------------------------------------------------------------------

def q_multimodal_metadata(spark, sf_dir):
    """Multimodal plumbing: treat a binary payload column with typed
    metadata; 'decode' runs in mapInPandas (Arrow batches). The real
    image/audio decode is STUBBED (no codec libs in this container) by
    a deterministic byte-level feature extractor — the Spark-side
    schema/partitioning/batch plumbing is real."""
    import pandas as pd
    d = load(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.col("text").cast("binary").alias("payload"))

    def decode_batch(batches):
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            first = pdf["payload"].map(lambda b: b[0] if len(b) else 0)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int64"),
                "fake_width": (n_bytes % 640).astype("int64"),
                "fake_height": (first.astype("int64") * 3) % 480,
            })

    return payloads.mapInPandas(
        decode_batch,
        "doc_id long, n_bytes long, fake_width long, fake_height long")

SQL_MULTIMODAL_METADATA = """
  SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
         CAST((ord(substr(text, 1, 1)) * 3) % 480 AS BIGINT) AS fake_height
  FROM documents
"""


# ---------------------------------------------------------------------------
# SimHash near-dup pairs + global dedup-cluster resolution (round 4)
# ---------------------------------------------------------------------------

#: 16-bit SimHash fingerprints band into 4 tables of 4 bits each; by
#: pigeonhole, any pair within Hamming distance SIMHASH_HAMMING_MAX (3)
#: differs in at most 3 bands and therefore agrees exactly on at least
#: one — banding has 100% recall at the threshold inside capped buckets
SIMHASH_BANDS = 4
SIMHASH_BITS_PER_BAND = 4
SIMHASH_HAMMING_MAX = 3


def q_simhash_near_dup(spark, sf_dir):
    """SimHash near-duplicate pairs: Hamming-distance dedup completed
    end-to-end (``q_simhash`` only emits fingerprints). Candidates are
    blocked by banding the 16-bit fingerprint into 4 tables of 4 bits —
    the classic multi-table SimHash index: pairs within Hamming <= 3
    share at least one full band, so a bucket-equijoin per band finds
    every qualifying pair without an all-pairs scan. Buckets follow the
    ``q_jaccard_near_dup`` occupancy discipline: all-pairs only up to
    ``JACCARD_BUCKET_CAP`` members, representative member->bucket-min
    keeper edges above (a bucket that large is one dup cluster), so the
    candidate volume is O(n x bands) on any corpus. Survivors verify
    with an exact JVM popcount: ``bit_count(fp_a XOR fp_b) <= 3`` —
    whole-stage codegen, no UDF anywhere.

    At 100 TB: fingerprints are one hash-agg over tokens; each band
    table is one shuffle on (band_id, band_value); the verify join
    moves only (doc_id, fingerprint) pairs. Nothing scales worse than
    the corpus itself."""
    # materialize the fingerprints once: bands/binfo/bx and both
    # verify sides all derive from fp, and without the checkpoint the
    # token-level hash agg re-runs per consumer (4x observed)
    fp = q_simhash(spark, sf_dir).localCheckpoint(eager=True)
    mask = (1 << SIMHASH_BITS_PER_BAND) - 1
    bands = fp.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.shiftright(F.col("simhash"), SIMHASH_BITS_PER_BAND * b)
            .bitwiseAND(F.lit(mask))
            for b in range(SIMHASH_BANDS)])).alias("band_id", "band_value"))
    cap = JACCARD_BUCKET_CAP
    # occupancy + representative as window aggs over one exchange
    # (see q_jaccard_near_dup); bx materializes once, three consumers
    wb = Window.partitionBy("band_id", "band_value")
    bx = (bands.withColumn("bsz", F.count("*").over(wb))
          .withColumn("bmin", F.min("doc_id").over(wb))
          .localCheckpoint(eager=True))
    small = bx.filter(F.col("bsz") <= cap)
    pairs_small = (
        small.select("band_id", "band_value", F.col("doc_id").alias("a"))
        .join(small.select("band_id", "band_value",
                           F.col("doc_id").alias("b")),
              ["band_id", "band_value"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    pairs_large = (
        bx.filter((F.col("bsz") > cap) & (F.col("doc_id") > F.col("bmin")))
        .select(F.col("bmin").alias("a"), F.col("doc_id").alias("b"))
    )
    cand = pairs_small.unionByName(pairs_large).distinct()
    fa = fp.select(F.col("doc_id").alias("a"), F.col("simhash").alias("fa"))
    fb = fp.select(F.col("doc_id").alias("b"), F.col("simhash").alias("fb"))
    return (
        cand.join(fa, "a").join(fb, "b")
        .withColumn("hamming",
                    F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
                    .cast("int"))
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
        .select("a", "b", "hamming")
    )

SQL_SIMHASH_NEAR_DUP = f"""
  WITH fp AS ({SQL_SIMHASH}),
  bands AS (
    SELECT doc_id,
           (simhash >> ({SIMHASH_BITS_PER_BAND} * CAST(t.k AS INT)))
             & {(1 << SIMHASH_BITS_PER_BAND) - 1} AS band_value,
           CAST(t.k AS INT) AS band_id
    FROM fp, UNNEST(range(0, {SIMHASH_BANDS})) AS t(k)
  ),
  binfo AS (
    SELECT band_id, band_value, COUNT(*) AS bsz, MIN(doc_id) AS bmin
    FROM bands GROUP BY band_id, band_value
  ),
  bx AS (
    SELECT b.doc_id, b.band_id, b.band_value, i.bsz, i.bmin
    FROM bands b JOIN binfo i
      ON b.band_id = i.band_id AND b.band_value = i.band_value
  ),
  cand AS (
    SELECT DISTINCT a, b FROM (
      SELECT x.doc_id AS a, y.doc_id AS b
      FROM bx x JOIN bx y
        ON x.band_id = y.band_id AND x.band_value = y.band_value
      WHERE x.bsz <= {JACCARD_BUCKET_CAP} AND x.doc_id < y.doc_id
      UNION ALL
      SELECT bmin AS a, doc_id AS b
      FROM bx WHERE bsz > {JACCARD_BUCKET_CAP} AND doc_id > bmin
    )
  )
  SELECT c.a, c.b,
         CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
  FROM cand c
  JOIN fp x ON x.doc_id = c.a
  JOIN fp y ON y.doc_id = c.b
  WHERE bit_count(xor(x.simhash, y.simhash)) <= {SIMHASH_HAMMING_MAX}
"""


#: hard ceiling on min-label propagation rounds; the LSH rep-edge
#: graph is a union of band-min stars whose diameter is the band
#: overlap chain length (single digits measured), so hitting this
#: means the input is not the expected near-dup graph
DEDUP_CC_MAX_ITERS = 64

#: rounds the last connected_components call took to converge —
#: profiling surface for the O(log n) claim (tests pin the chain
#: fixture's bound; bench evidence records the fixture corpora)
LAST_CC_ROUNDS = 0


def connected_components(edges: DataFrame) -> DataFrame:
    """Distributed connected components over an ``(a, b)`` edge
    DataFrame → ``(doc_id, lbl)`` with ``lbl`` = min doc_id in the
    component. Iterative min-label propagation with POINTER JUMPING:
    each round takes (1) the min over each node's own and neighbors'
    labels (one shuffle on doc_id, map-side combinable min-agg), then
    (2) ``label <- label(label)`` (one self-join on the label), which
    halves the label-tree depth — so convergence is O(log n) rounds on
    ANY graph shape, including chain-shaped dup clusters where plain
    propagation needs O(diameter) rounds. Labels only ever decrease
    and are bounded below by the component min, so the monotone
    label-sum fixpoint detects convergence with one scalar per round
    on the driver — never the labels themselves. Each round
    ``localCheckpoint``s so the plan does not grow with iterations
    (the crawl cascade's pattern)."""
    sym = edges.select("a", "b").unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)  # computed once, re-read every round
    lab = (sym.select(F.col("a").alias("doc_id")).distinct()
           .withColumn("lbl", F.col("doc_id"))
           .localCheckpoint(eager=False))
    prev_sum = lab.agg(F.sum("lbl")).collect()[0][0]
    global LAST_CC_ROUNDS
    for rounds in range(1, DEDUP_CC_MAX_ITERS + 1):
        nbr_min = (
            sym.join(lab.withColumnRenamed("doc_id", "a"), "a")
            .groupBy(F.col("b").alias("doc_id"))
            .agg(F.min("lbl").alias("nbr_lbl")))
        stepped = (
            lab.join(nbr_min, "doc_id", "left")
            .select("doc_id",
                    F.least(F.col("lbl"),
                            F.coalesce(F.col("nbr_lbl"), F.col("lbl")))
                    .alias("lbl")))
        # pointer jump: every label value IS a node's doc_id, so
        # label(label) is a lookup into the same labeling
        parent = stepped.select(F.col("doc_id").alias("p_id"),
                                F.col("lbl").alias("p_lbl"))
        # lazy checkpoint: the convergence-sum action materializes
        # the cached partitions in the SAME job (eager=True spent one
        # extra job launch per round just to warm the cache first)
        lab = (
            stepped.join(parent, stepped["lbl"] == parent["p_id"], "left")
            .select("doc_id",
                    F.coalesce(F.col("p_lbl"), F.col("lbl")).alias("lbl"))
            .localCheckpoint(eager=False))
        s = lab.agg(F.sum("lbl")).collect()[0][0]
        if s == prev_sum:
            LAST_CC_ROUNDS = rounds
            return lab
        prev_sum = s
    raise RuntimeError(
        f"connected_components did not converge in {DEDUP_CC_MAX_ITERS} "
        "pointer-jumping rounds — needs > 2^64 label-tree depth, which "
        "no finite input produces; indicates nondeterministic input")


def q_dedup_clusters(spark, sf_dir):
    """Global dedup-cluster resolution: connected components over the
    verified MinHash-LSH near-dup edges (``q_jaccard_lsh_pairs``),
    giving every near-dup doc its canonical keeper (min doc_id in its
    component) and the component size — the step that turns pairwise
    near-dup evidence into the keep/drop decision a 100 TB dedup
    actually executes (pairs alone under-delete: a~b and b~c must
    collapse to ONE keeper even when a~c was never emitted).

    Implemented on ``connected_components`` (min-label propagation
    with pointer jumping — O(log n) rounds on any graph shape, one
    label shuffle + one label self-join per round; see its
    docstring)."""
    edges = q_jaccard_lsh_pairs(spark, sf_dir).select("a", "b")
    lab = connected_components(edges)
    sizes = lab.groupBy("lbl").agg(F.count("*").alias("cluster_size"))
    return (
        lab.join(sizes, "lbl")
        .select("doc_id", F.col("lbl").alias("keeper_doc_id"),
                "cluster_size")
    )

SQL_DEDUP_CLUSTERS = f"""
  WITH RECURSIVE pairs AS (
    SELECT a, b FROM ({SQL_JACCARD_LSH_PAIRS})
  ),
  sym AS (
    SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
  ),
  reach(node, r) AS (
    SELECT DISTINCT a, a FROM sym
    UNION
    SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.node
  ),
  lab AS (
    SELECT node AS doc_id, MIN(r) AS keeper_doc_id
    FROM reach GROUP BY node
  )
  SELECT doc_id, keeper_doc_id,
         COUNT(*) OVER (PARTITION BY keeper_doc_id) AS cluster_size
  FROM lab
"""


#: winnowing parameters (Schleimer et al., the MOSS scheme): k-char
#: Karp-Rabin grams, window-min selection over w consecutive gram
#: hashes — guarantees any shared substring of length >= k + w - 1
#: shares at least one selected fingerprint
WINNOW_K = 8
WINNOW_W = 4
WINNOW_B = 31
WINNOW_P = 2147483647


def _winnow_fps_df(d, k: int = WINNOW_K, w: int = WINNOW_W):
    """doc_id + winnowed fingerprint ARRAY (distinct selected k-gram
    hashes), pure JVM: code-point array → k-gram Karp-Rabin hashes
    (element_at polynomial sum, code·B^j mod P — products stay < 2^52,
    no overflow in either engine) → window-min selection. Each stage
    is its OWN projection: lambda bodies re-evaluate captured
    expression trees per element (no CSE inside higher-order
    functions), so inlining norm/codes/grams into one expression goes
    O(len²·k) with the regexp re-run per gram — materializing per
    stage keeps it O(len·k) and CollapseProject leaves multi-referenced
    non-cheap arrays alone. Declarative recomputation instead of the
    sequential rolling recurrence is the trade that keeps it inside
    whole-stage codegen with zero Python; k=8 bounds the constant."""
    norm = F.lower(F.regexp_replace(F.col("text"), "\\s+", " "))
    pows = [pow(WINNOW_B, k - 1 - j, WINNOW_P) for j in range(k)]
    d = _spread(d.select("doc_id", "text"))
    codes = d.select(
        "doc_id",
        F.transform(F.split(norm, ""),
                    lambda c: F.ascii(c).cast("long")).alias("codes"))

    def gram_hash(i):
        # i is 0-based gram start; element_at is 1-based, O(1)
        total = None
        for j in range(k):
            term = F.element_at(F.col("codes"), i + j + 1) * F.lit(pows[j])
            total = term if total is None else total + term
        return total % F.lit(WINNOW_P)

    n_codes = F.size(F.col("codes"))
    grams = codes.select(
        "doc_id",
        F.when(
            n_codes >= k,
            F.transform(F.sequence(F.lit(0), n_codes - k), gram_hash)
        ).otherwise(F.array().cast("array<long>")).alias("grams"))
    n = F.size(F.col("grams"))
    mins = F.when(
        n >= w,
        F.transform(F.sequence(F.lit(0), n - w),
                    lambda t: F.array_min(F.slice(F.col("grams"), t + 1, w)))
    ).when(n > 0, F.array(F.array_min(F.col("grams")))) \
     .otherwise(F.array().cast("array<long>"))
    return grams.select("doc_id", F.array_distinct(mins).alias("fps"))


def q_winnow_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprinting (winnowing): shared-
    fingerprint groups across the corpus — docs sharing any substring
    of length >= k+w-1 (11 chars at the defaults) share at least one
    selected k-gram hash, so grouping by fingerprint value surfaces
    PARTIAL overlap that whole-document hashing cannot. Output one row
    per distinct fingerprint value: how many docs carry it and the
    smallest. At 100 TB this is explode + hash-groupBy — map-side
    combinable, no joins."""
    d = load(spark, sf_dir, "documents")
    # explode_OUTER + post-generate null filter, NOT explode: a plain
    # explode makes InferFiltersFromGenerate add `size(fps) > 0` below
    # the Generate, and PushDownPredicates then substitutes the whole
    # staged lambda pipeline into that predicate — interpreted nested
    # ArrayTransforms re-evaluate the captured arrays per element,
    # O(len²·k) per row (observed: a 5 s job spinning for 11+ min).
    # The outer variant infers no filter; the IS NOT NULL references
    # the generated attribute so it cannot sink below the Generate.
    return (
        _winnow_fps_df(d)
        .select("doc_id", F.explode_outer("fps").alias("fp"))
        .filter(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("group_size"),
             F.min("doc_id").alias("min_doc_id"))
    )

_SQL_WINNOW_GRAM = " + ".join(
    f"CAST(unicode(substr(norm, i + {j}, 1)) AS BIGINT)"
    f" * {pow(WINNOW_B, WINNOW_K - 1 - j, WINNOW_P)}"
    for j in range(WINNOW_K))

SQL_WINNOW_FINGERPRINT = f"""
  WITH normd AS (
    SELECT doc_id, LOWER(regexp_replace(text, '\\s+', ' ', 'g')) AS norm
    FROM documents
  ),
  gramsd AS (
    SELECT doc_id,
           CASE WHEN len(norm) >= {WINNOW_K} THEN
             list_transform(range(1, len(norm) - {WINNOW_K} + 2),
                            i -> ({_SQL_WINNOW_GRAM}) % {WINNOW_P})
           ELSE [] END AS grams
    FROM normd
  ),
  selected AS (
    SELECT doc_id,
           CASE WHEN len(grams) >= {WINNOW_W} THEN
             list_transform(range(1, len(grams) - {WINNOW_W} + 2),
                            t -> list_min(grams[t:t + {WINNOW_W} - 1]))
           WHEN len(grams) > 0 THEN [list_min(grams)]
           ELSE [] END AS fps
    FROM gramsd
  )
  SELECT u.fp, COUNT(DISTINCT s.doc_id) AS group_size,
         MIN(s.doc_id) AS min_doc_id
  FROM selected s, UNNEST(list_distinct(s.fps)) AS u(fp)
  GROUP BY u.fp
"""


#: shingle width for the n-gram Jaccard variant (3-word shingles —
#: word-order-sensitive near-dup, the classic MinHash unit)
SHINGLE_K = 3


def _shingles_col(w, k: int = SHINGLE_K):
    """k-word shingle array from an ALREADY-MATERIALIZED words-array
    attribute column ``w`` — pure JVM (sequence + transform +
    element_at), empty for docs shorter than k words.

    ``w`` must be an attribute of a child projection, never the
    ``_words()`` split expression itself: a lambda that captures a
    non-attribute expression re-evaluates it per element (no CSE
    inside higher-order functions), turning the O(len·k) shingle build
    into O(len²·k). Callers stage ``_words().alias(...)`` first."""
    return F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j + 1) for j in range(k)]))
    ).otherwise(F.array().cast("array<string>"))


def _shingle_docs(d):
    """doc_id + ``sh`` shingle-array column, staged through a
    materialized words column (see ``_shingles_col``)."""
    return (_spread(d.select("doc_id", "text"))
            .select("doc_id", _words().alias("w_arr"))
            .select("doc_id",
                    _shingles_col(F.col("w_arr")).alias("sh")))


def q_jaccard_shingle_pairs(spark, sf_dir):
    """n-gram (3-word shingle) Jaccard near-dup: the word-ORDER-
    sensitive variant of ``q_jaccard_lsh_pairs`` — two docs with the
    same bag of words but different sentences stop matching. The chain
    is the textbook shingle→minhash→band→bucket-join: shingles hash
    through the same cross-engine base hash and 64 affine permuters as
    the unigram signatures (one md5 per shingle, 64 min-aggs in ONE
    hash-agg pass), band into 8×8 with representative bucket-min
    edges, and survivors verify with exact shingle-set Jaccard ≥ 0.8
    (semi-pruned ``_jaccard_verify`` over the shingle arrays)."""
    d = load(spark, sf_dir, "documents")
    # explode_outer + null filter for the same InferFiltersFromGenerate
    # pushdown reason as q_winnow_fingerprint (the substituted shingle
    # lambda in an inferred size()>0 predicate goes O(len²·k) per row)
    tokens = (_shingle_docs(d)
              .select("doc_id", F.explode_outer("sh").alias("w"))
              .filter(F.col("w").isNotNull())
              .select("doc_id", _token_base_col(F.col("w")).alias("bm")))
    aggs = [
        F.min((F.lit(a) * F.col("bm") + F.lit(b)) % F.lit(MINHASH64_P))
        .alias(f"s{i}")
        for i, (a, b) in enumerate(MINHASH64_AB)]
    wide = tokens.groupBy("doc_id").agg(*aggs)
    rpb = MINHASH64_ROWS_PER_BAND
    vals = [
        F.concat_ws("|", *[F.col(f"s{b * rpb + r}").cast("string")
                           for r in range(rpb)])
        for b in range(N_MINHASH64 // rpb)]
    bands = wide.select(
        "doc_id",
        F.posexplode(F.array(*vals)).alias("band_id", "band_value")) \
        .localCheckpoint(eager=True)  # mins + candidate join both consume
    mins = bands.groupBy("band_id", "band_value").agg(
        F.min("doc_id").alias("a"))
    cand = (
        bands.join(mins, ["band_id", "band_value"])
        .filter(F.col("doc_id") > F.col("a"))
        .select("a", F.col("doc_id").alias("b")).distinct()
    )
    return _jaccard_verify(spark, sf_dir, cand, unit="shingles")

_SQL_SHINGLES = f"""
    SELECT doc_id,
           list_transform(
             range(1, greatest(len(w) - {SHINGLE_K - 2}, 1)),
             i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]) AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
"""

SQL_JACCARD_SHINGLE_PAIRS = f"""
  WITH shd AS ({_SQL_SHINGLES}),
  sigs AS (
    SELECT t.doc_id, CAST(p.h AS INT) AS h,
           MIN((p.a * t.bm + p.b) % {MINHASH64_P}) AS sig
    FROM (
      SELECT s.doc_id,
             CAST(concat('0x', substr(md5(u.g), 1, 15)) AS BIGINT)
               % {MINHASH64_P} AS bm
      FROM shd s, UNNEST(s.sh) AS u(g)
    ) t,
    (VALUES {_PERM_VALUES}) AS p(h, a, b)
    GROUP BY t.doc_id, p.h
  ),
  bands AS (
    SELECT doc_id, CAST(h // {MINHASH64_ROWS_PER_BAND} AS INT) AS band_id,
           string_agg(CAST(sig AS VARCHAR), '|' ORDER BY h) AS band_value
    FROM sigs GROUP BY doc_id, band_id
  ),
  mins AS (
    SELECT band_id, band_value, MIN(doc_id) AS a
    FROM bands GROUP BY band_id, band_value
  ),
  cand AS (
    SELECT DISTINCT m.a, x.doc_id AS b
    FROM bands x JOIN mins m
      ON x.band_id = m.band_id AND x.band_value = m.band_value
    WHERE x.doc_id > m.a
  ),
  tarr AS (SELECT doc_id, list_distinct(sh) AS ta FROM shd),
  scored AS (
    SELECT c.a, c.b,
           len(list_intersect(x.ta, y.ta)) AS n_common,
           len(x.ta) AS sz_a, len(y.ta) AS sz_b
    FROM cand c
    JOIN tarr x ON x.doc_id = c.a
    JOIN tarr y ON y.doc_id = c.b
  )
  SELECT a, b, n_common,
         ROUND(CAST(n_common AS DOUBLE)
               / (sz_a + sz_b - n_common), 6) AS jaccard
  FROM scored
  WHERE n_common > 0
    AND ROUND(CAST(n_common AS DOUBLE)
              / (sz_a + sz_b - n_common), 6) >= 0.8
"""


# ---------------------------------------------------------------------------
# merged driver entries (the 50-entry driver cap, tests/test_entry_contract)
# ---------------------------------------------------------------------------

def q_jaccard_near_dup_all(spark, sf_dir):
    """Both Jaccard near-dup blocking schemes in ONE driver row (the
    ``crawl_trace`` merge pattern: the driver records at most 50
    correctness entries, so same-schema variants union under a tag
    column instead of spending two slots): ``capped_buckets`` =
    ``q_jaccard_near_dup`` (all intra-bucket pairs up to the cap),
    ``rep_edges`` = ``q_jaccard_lsh_pairs`` (representative edges
    only), ``shingle3_rep_edges`` = ``q_jaccard_shingle_pairs``
    (word-order-sensitive 3-gram shingles). Each variant's full row
    set still hash-verifies — the union is exactly the results side
    by side."""
    nd = q_jaccard_near_dup(spark, sf_dir) \
        .withColumn("blocking", F.lit("capped_buckets"))
    lsh = q_jaccard_lsh_pairs(spark, sf_dir) \
        .withColumn("blocking", F.lit("rep_edges"))
    sh = q_jaccard_shingle_pairs(spark, sf_dir) \
        .withColumn("blocking", F.lit("shingle3_rep_edges"))
    return nd.unionByName(lsh).unionByName(sh)

SQL_JACCARD_NEAR_DUP_ALL = f"""
  SELECT a, b, n_common, jaccard, 'capped_buckets' AS blocking
  FROM ({SQL_JACCARD_NEAR_DUP})
  UNION ALL
  SELECT a, b, n_common, jaccard, 'rep_edges' AS blocking
  FROM ({SQL_JACCARD_LSH_PAIRS})
  UNION ALL
  SELECT a, b, n_common, jaccard, 'shingle3_rep_edges' AS blocking
  FROM ({SQL_JACCARD_SHINGLE_PAIRS})
"""


def q_ann_topk(spark, sf_dir):
    """All three ANN strategies' top-10 in ONE driver row (same
    50-entry rationale as ``q_jaccard_near_dup_all``): ``bruteforce``
    = exact cosine scan (``q_ann_bruteforce_cosine``, cell is NULL),
    ``ivf`` = inverted-file probe (``q_ann_ivf``), ``ivf_lloyd2`` =
    IVF with 2 Lloyd refinements of the quantizer (``q_ann_ivf_lloyd``
    — the recall-quality variant, see ``ivf_topk``). Each ranking
    hash-verifies independently under the ``method`` tag. Brute force
    has no cell: -1 sentinel (NULLs don't sort in the value-hash
    comparators)."""
    bf = (q_ann_bruteforce_cosine(spark, sf_dir)
          .withColumn("cell", F.lit(-1).cast("int"))
          .withColumn("method", F.lit("bruteforce")))
    ivf = q_ann_ivf(spark, sf_dir).withColumn("method", F.lit("ivf"))
    lloyd = q_ann_ivf_lloyd(spark, sf_dir) \
        .withColumn("method", F.lit("ivf_lloyd2"))
    cols = ["method", "rank", "vec_id", "label", "cell", "cosine"]
    return (bf.select(*cols)
            .unionByName(ivf.select(*cols))
            .unionByName(lloyd.select(*cols)))

SQL_ANN_TOPK = f"""
  SELECT 'bruteforce' AS method, rank, vec_id, label,
         CAST(-1 AS INTEGER) AS cell, cosine
  FROM ({SQL_ANN_BRUTEFORCE})
  UNION ALL
  SELECT 'ivf' AS method, rank, vec_id, label, cell, cosine
  FROM ({SQL_ANN_IVF})
  UNION ALL
  SELECT 'ivf_lloyd2' AS method, rank, vec_id, label, cell, cosine
  FROM ({SQL_ANN_IVF_LLOYD})
"""


def q_doc_fingerprint_all(spark, sf_dir):
    """All three fingerprinting schemes in ONE driver row (same
    50-entry rationale as ``q_jaccard_near_dup_all``): ``md5_whole`` =
    whole-document md5 groups (``q_doc_fingerprint``), ``winnow_k8w4``
    = rolling-hash winnowing fingerprint groups
    (``q_winnow_fingerprint``, fp rendered as a decimal string so the
    schemes share the string fingerprint column), ``seg16_md5`` =
    non-overlapping 16-word passage-dedup groups
    (``q_segment_dedup``). Each scheme's full row set still
    hash-verifies under the ``scheme`` tag."""
    md = q_doc_fingerprint(spark, sf_dir) \
        .withColumn("scheme", F.lit("md5_whole"))
    wn = (q_winnow_fingerprint(spark, sf_dir)
          .select(F.col("fp").cast("string").alias("fingerprint"),
                  "group_size", "min_doc_id")
          .withColumn("scheme", F.lit("winnow_k8w4")))
    sg = q_segment_dedup(spark, sf_dir) \
        .withColumn("scheme", F.lit("seg16_md5"))
    # round 5: content-defined chunking — the alignment-invariant
    # passage scheme (q_cdc_segment_dedup; defined further down, so
    # resolved lazily here)
    cdc = q_cdc_segment_dedup(spark, sf_dir) \
        .withColumn("scheme", F.lit("cdc_w8"))
    return md.unionByName(wn).unionByName(sg).unionByName(cdc)

SQL_DOC_FINGERPRINT_ALL = f"""
  SELECT fingerprint, group_size, min_doc_id, 'md5_whole' AS scheme
  FROM ({SQL_DOC_FINGERPRINT})
  UNION ALL
  SELECT CAST(fp AS VARCHAR) AS fingerprint, group_size, min_doc_id,
         'winnow_k8w4' AS scheme
  FROM ({SQL_WINNOW_FINGERPRINT})
  UNION ALL
  SELECT fingerprint, group_size, min_doc_id, 'seg16_md5' AS scheme
  FROM ({SQL_SEGMENT_DEDUP})
"""


#: production-width SimHash parameters (the bench-only fast variant):
#: 64-bit fingerprints, 8 bands x 8 bits, same Hamming <= 3 pigeonhole
#: recall guarantee (3 differing bits touch at most 3 of 8 bands)
SIMHASH64_BANDS = 8
SIMHASH64_BITS_PER_BAND = 8


def q_simhash64_near_dup_fast(spark, sf_dir):
    """Production fast path for ``q_simhash_near_dup``: 64-bit
    fingerprints whose bit-k vote is bit k of ``xxhash64(token)``
    (one 64-bit JVM hash per token, no md5 + hex-digit parse), banded
    into 8 tables of 8 bits with the same ``JACCARD_BUCKET_CAP`` +
    keeper-edge occupancy discipline and the same
    ``bit_count(fp_a XOR fp_b) <= 3`` popcount verify. The 64 bit
    votes are 64 conditional sums in ONE map-side-combinable hash-agg
    pass (the ``q_minhash64_signatures`` shape). xxhash64 has no
    DuckDB equivalent, so this variant is benched and cross-checked
    against a pure-Python fold of the same JVM base hashes
    (``tests/test_fast_variants.py``) rather than oracle-checked; the
    16-bit md5 variant stays the cross-engine parity surface. At
    100 TB this is the one to run: 64-bit fingerprints make Hamming
    <= 3 a strong near-dup signal instead of the toy 16-bit width."""
    d = load(spark, sf_dir, "documents")
    tokens = d.select("doc_id", F.explode(_words()).alias("w")) \
        .select("doc_id", F.xxhash64(F.col("w")).alias("h"))
    votes = tokens.groupBy("doc_id").agg(*[
        F.sum(F.when(F.shiftright(F.col("h"), k).bitwiseAND(F.lit(1)) == 1,
                     F.lit(1)).otherwise(F.lit(-1))).alias(f"v{k}")
        for k in range(64)])
    fp = None
    for k in range(64):
        bit = F.when(F.col(f"v{k}") > 0,
                     F.shiftleft(F.lit(1).cast("long"), k)) \
            .otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp + bit
    # one materialization of the 64-bit fingerprints (same 4-consumer
    # recompute hazard as q_simhash_near_dup)
    fps = votes.select("doc_id", fp.alias("simhash64")) \
        .localCheckpoint(eager=True)
    mask = (1 << SIMHASH64_BITS_PER_BAND) - 1
    bands = fps.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.shiftright(F.col("simhash64"), SIMHASH64_BITS_PER_BAND * b)
            .bitwiseAND(F.lit(mask))
            for b in range(SIMHASH64_BANDS)])).alias("band_id", "band_value"))
    cap = JACCARD_BUCKET_CAP
    # occupancy + representative as window aggs over one exchange
    # (see q_jaccard_near_dup); bx materializes once, three consumers
    wb = Window.partitionBy("band_id", "band_value")
    bx = (bands.withColumn("bsz", F.count("*").over(wb))
          .withColumn("bmin", F.min("doc_id").over(wb))
          .localCheckpoint(eager=True))
    small = bx.filter(F.col("bsz") <= cap)
    pairs_small = (
        small.select("band_id", "band_value", F.col("doc_id").alias("a"))
        .join(small.select("band_id", "band_value",
                           F.col("doc_id").alias("b")),
              ["band_id", "band_value"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    pairs_large = (
        bx.filter((F.col("bsz") > cap) & (F.col("doc_id") > F.col("bmin")))
        .select(F.col("bmin").alias("a"), F.col("doc_id").alias("b"))
    )
    cand = pairs_small.unionByName(pairs_large).distinct()
    fa = fps.select(F.col("doc_id").alias("a"),
                    F.col("simhash64").alias("fa"))
    fb = fps.select(F.col("doc_id").alias("b"),
                    F.col("simhash64").alias("fb"))
    return (
        cand.join(fa, "a").join(fb, "b")
        .withColumn("hamming",
                    F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
                    .cast("int"))
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
        .select("a", "b", "hamming")
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction
# ---------------------------------------------------------------------------

#: idf table broadcast gate: vocabulary rows are (term, df) pairs —
#: tiny vs the corpus, but a pathological generated vocabulary must
#: fall back to the shuffle join instead of a multi-GB broadcast
TFIDF_BCAST_LIMIT = 5_000_000

#: top-k terms kept per document
TFIDF_TOP_K = 3


def q_tfidf_top_terms(spark, sf_dir):
    """Per-document top-3 keywords by TF-IDF (the classic corpus
    statistic a training-data pipeline uses for topic tagging /
    keyword indexing). tfidf = tf · ln(N/df), ties broken by term so
    the result is deterministic.

    Shuffle structure at 100 TB: one map-side-combinable (doc_id,
    term) count for tf, one term-grain count over per-doc DISTINCT
    terms for df (the only corpus-global fact IDF needs — exploding
    ``array_distinct`` first means the shuffle carries one row per
    (doc, distinct term), never per token), an idf join that
    broadcasts below ``TFIDF_BCAST_LIMIT`` vocabulary rows and
    shuffle-joins above it, and a per-doc top-k that plans as
    WindowGroupLimit (rank filter pushed map-side) rather than a full
    per-doc sort."""
    d = load(spark, sf_dir, "documents")
    n_docs = d.count()  # corpus cardinality: one scalar job
    base = d.select("doc_id", _words().alias("w"))
    tf = (base.select("doc_id", F.explode("w").alias("term"))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    # df derives FROM tf: tf holds exactly one row per (doc, distinct
    # term), so counting tf rows per term IS the document frequency —
    # the old explode(array_distinct(w)) path re-tokenized the whole
    # corpus a second time to produce the same rows (guide §1.2: don't
    # compute things twice). One corpus scan total, and the second agg
    # reuses tf's (doc_id, term) exchange.
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = dfreq.select(
        "term",
        F.log(F.lit(float(n_docs)) / F.col("df")).alias("idf"))
    # materialize once: the gate count and the join otherwise each
    # re-run the df derivation's corpus explode+agg
    idf = idf.localCheckpoint(eager=True)
    idf_side = F.broadcast(idf) if idf.count() <= TFIDF_BCAST_LIMIT \
        else idf
    scored = tf.join(idf_side, "term").select(
        "doc_id", "term",
        F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= TFIDF_TOP_K)
            .select("doc_id", "term", "tfidf",
                    F.col("rnk").cast("int").alias("rnk")))


SQL_TFIDF_TOP_TERMS = f"""
  WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term
    FROM documents
  ),
  tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
  ),
  dfreq AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
  ),
  n AS (SELECT COUNT(*) AS n FROM documents),
  scored AS (
    SELECT tf.doc_id, tf.term,
           ROUND(tf.tf * LN(n.n::DOUBLE / dfreq.df), 6) AS tfidf
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
  )
  SELECT doc_id, term, tfidf, rnk FROM (
    SELECT doc_id, term, tfidf,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY doc_id ORDER BY tfidf DESC, term
           ) AS INT) AS rnk
    FROM scored
  ) WHERE rnk <= {TFIDF_TOP_K}
"""


# ---------------------------------------------------------------------------
# deterministic train/val/test split
# ---------------------------------------------------------------------------

#: permille thresholds: [0, TRAIN) train, [TRAIN, VAL) val, rest test
SPLIT_TRAIN_PERMILLE = 900
SPLIT_VAL_PERMILLE = 950


def q_train_split(spark, sf_dir):
    """Deterministic content-hash corpus split (train/val/test
    900/50/50 permille) — the leakage-safe way to split training
    data: the split key is a hash of the CONTENT (so exact dups land
    in the same split regardless of doc_id, and re-ingesting a
    shuffled corpus reproduces the split bit-for-bit), not row
    position or a random seed. Pure JVM expressions on a single
    corpus scan — md5 is the cross-engine parity surface (xxhash64
    would be the production hash, same shape); the per-split rollup
    is one map-side-combinable hash agg."""
    d = load(spark, sf_dir, "documents")
    bucket = (F.conv(F.substring(
        F.md5(F.col("text").cast("binary")), 1, 6), 16, 10)
        .cast("long") % 1000)
    tagged = d.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < SPLIT_TRAIN_PERMILLE, F.lit("train"))
        .when(bucket < SPLIT_VAL_PERMILLE, F.lit("val"))
        .otherwise(F.lit("test")).alias("split"))
    return (tagged.groupBy("split")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("first_doc_id"),
                 F.max("doc_id").alias("last_doc_id")))


SQL_TRAIN_SPLIT = f"""
  WITH tagged AS (
    SELECT doc_id,
           CASE WHEN b < {SPLIT_TRAIN_PERMILLE} THEN 'train'
                WHEN b < {SPLIT_VAL_PERMILLE} THEN 'val'
                ELSE 'test' END AS split
    FROM (
      SELECT doc_id,
             CAST(('0x' || substring(md5(text), 1, 6)) AS BIGINT)
               % 1000 AS b
      FROM documents
    )
  )
  SELECT split, COUNT(*) AS n_docs,
         MIN(doc_id) AS first_doc_id,
         MAX(doc_id) AS last_doc_id
  FROM tagged GROUP BY split
"""


def assign_split(d: DataFrame) -> DataFrame:
    """Row-level variant of ``q_train_split``: the input frame with a
    ``split`` column appended (what a pipeline actually writes,
    e.g. ``df.write.partitionBy("split")``)."""
    bucket = (F.conv(F.substring(
        F.md5(F.col("text").cast("binary")), 1, 6), 16, 10)
        .cast("long") % 1000)
    return d.withColumn(
        "split",
        F.when(bucket < SPLIT_TRAIN_PERMILLE, F.lit("train"))
        .when(bucket < SPLIT_VAL_PERMILLE, F.lit("val"))
        .otherwise(F.lit("test")))


# ---------------------------------------------------------------------------
# PII scrub (round 5): every production webtext pipeline redacts
# emails / phone numbers / IPs before training (e.g. the C4 and
# RefinedWeb cleanup passes). Pure JVM regexp projection — ONE corpus
# scan, no shuffle, no UDF; at 100 TB this is a map-only stage whose
# cost is the scan itself. Patterns are deliberately in the common
# subset of Java regex (Spark) and RE2-ish DuckDB regex so the oracle
# is exact.
# ---------------------------------------------------------------------------

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d{3}[- ]\d{3}[- ]\d{4}"


def pii_scrub(d: DataFrame) -> DataFrame:
    """Row-level PII redaction over a frame with (doc_id, text):
    emails, then IPv4s, then phone numbers are replaced by typed
    placeholder tokens, with per-doc match counts. Counts are taken
    on the PROGRESSIVELY redacted text (each count sees exactly the
    string its replacement ran on), so a digit run inside an email
    can never double-count as a phone."""
    red1 = F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>")
    red2 = F.regexp_replace(red1, PII_IPV4, "<IP>")
    red3 = F.regexp_replace(red2, PII_PHONE, "<PHONE>")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL))
         .cast("bigint").alias("n_emails"),
        F.regexp_count(red1, F.lit(PII_IPV4))
         .cast("bigint").alias("n_ipv4"),
        F.regexp_count(red2, F.lit(PII_PHONE))
         .cast("bigint").alias("n_phones"),
        red3.alias("redacted"),
    )


def q_pii_scrub(spark, sf_dir):
    """PII scrub over the documents table (pytest-oracle op — the
    driver's 50-entry cap is full, same convention as
    ``q_tfidf_top_terms``)."""
    return pii_scrub(_spread(load(spark, sf_dir, "documents")
                           .select("doc_id", "text")))


SQL_PII_SCRUB = (
    "  SELECT doc_id,\n"
    "         CAST(len(regexp_extract_all(text, '" + PII_EMAIL + "'))"
    " AS BIGINT) AS n_emails,\n"
    "         CAST(len(regexp_extract_all(r1, '" + PII_IPV4 + "'))"
    " AS BIGINT) AS n_ipv4,\n"
    "         CAST(len(regexp_extract_all(r2, '" + PII_PHONE + "'))"
    " AS BIGINT) AS n_phones,\n"
    "         regexp_replace(r2, '" + PII_PHONE + "', '<PHONE>', 'g')"
    " AS redacted\n"
    "  FROM (\n"
    "    SELECT doc_id, text, r1,\n"
    "           regexp_replace(r1, '" + PII_IPV4 + "', '<IP>', 'g') AS r2\n"
    "    FROM (\n"
    "      SELECT doc_id, text,\n"
    "             regexp_replace(text, '" + PII_EMAIL + "',"
    " '<EMAIL>', 'g') AS r1\n"
    "      FROM documents))\n"
)


# ---------------------------------------------------------------------------
# Weighted corpus mixing (round 5): the dataset-assembly step
# train_split doesn't cover — deterministic per-group hash-threshold
# sampling that hits target per-source proportions. The mix is the
# LARGEST corpus achieving the exact target shares given what each
# group actually has (the binding group keeps everything; every other
# group downsamples to proportion). Selection is a pure projection +
# filter against integer thresholds (md5 prefix, the train_split
# parity surface): order-invariant, re-runnable, shuffle-free — at
# 100 TB the only non-scan cost is one dimension-sized group count.
# ---------------------------------------------------------------------------

CORPUS_MIX_WEIGHTS = {
    "en": 0.40, "es": 0.20, "de": 0.20, "fr": 0.15, "zh": 0.05}
MIX_HASH_MOD = 1 << 24  # md5 6-hex-digit prefix domain


def mix_rates(counts: dict, weights: dict) -> dict:
    """Integer keep-thresholds (out of ``MIX_HASH_MOD``) per group.

    total = min over weighted groups of counts[g] / weights[g] is the
    largest mix size whose composition can match ``weights`` exactly;
    each group's keep rate is weights[g] * total / counts[g] (1.0 for
    the binding group). Thresholds are floored to integers HERE, once,
    so the Spark filter and the SQL oracle share identical cutoffs —
    groups without a weight (or without rows), and groups whose weight
    is 0.0 (kept out of ``avail`` so they can neither divide by zero
    nor bind the total), get 0 (dropped)."""
    avail = {g: counts[g] for g in weights if counts.get(g) and weights[g]}
    if not avail:
        return {g: 0 for g in weights}
    total = min(avail[g] / weights[g] for g in avail)
    out = {}
    for g in weights:
        if g not in avail:
            out[g] = 0
            continue
        rate = min(1.0, weights[g] * total / avail[g])
        out[g] = min(MIX_HASH_MOD, int(rate * MIX_HASH_MOD))
    return out


def _mix_hash_col():
    # same cross-engine md5-prefix integer as train_split; keyed on
    # doc_id (sampling identity), uniform over [0, MIX_HASH_MOD)
    return F.conv(F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 6),
        16, 10).cast("long")


def corpus_mix(spark, d: DataFrame, group_col: str,
               weights: dict) -> tuple:
    """Returns (sampled_df, thresholds). One WEIGHTS-bounded count job
    picks the thresholds (the groupBy/collect is filtered to the
    weighted keys FIRST, so pointing the mix at a high-cardinality
    group column — per-domain mixing over 10^8 origins — can never
    materialize more than O(|weights|) rows on the driver; unweighted
    groups were always dropped by mix_rates anyway). The sample itself
    is a pure projection + filter: the O(|weights|) thresholds inline
    as a literal CASE ladder, so the corpus side needs no join at all —
    one scan, zero exchanges."""
    keys = list(weights)
    counts = {r[group_col]: r["n"] for r in
              d.filter(F.col(group_col).isin(keys))
              .groupBy(group_col).agg(F.count("*").alias("n"))
              .collect()}
    thr = mix_rates(counts, weights)
    tc = F.lit(0)
    for g in sorted(thr, key=lambda k: (k is None, k)):
        if thr[g]:
            tc = F.when(F.col(group_col) == g, F.lit(thr[g])).otherwise(tc)
    return d.filter(_mix_hash_col() < tc), thr


def q_corpus_mix(spark, sf_dir):
    """Weighted mix of the documents table by declared lang (pytest-
    oracle op). Output = the kept rows' identities, so the oracle
    checks the exact selection, not just the counts."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    out, _ = corpus_mix(spark, d, "lang", CORPUS_MIX_WEIGHTS)
    return out.select("doc_id", "lang")


def sql_corpus_mix(thresholds: dict) -> str:
    """DuckDB oracle for ``q_corpus_mix`` given the SAME integer
    thresholds (computed once by ``mix_rates`` — data-dependent, so
    the SQL is generated, mirroring how a warehouse would template
    the sampling predicate)."""
    cases = "\n".join(
        f"           WHEN lang = '{g}' THEN {t}"
        for g, t in sorted(thresholds.items()))
    return f"""
  SELECT doc_id, lang FROM (
    SELECT doc_id, lang,
           CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                AS BIGINT) AS h,
           CASE
{cases}
           ELSE 0 END AS thr
    FROM documents)
  WHERE h < thr
"""


# ---------------------------------------------------------------------------
# Content-defined segment dedup (round 5): the overlap-proof variant
# of q_segment_dedup. Fixed segmentation misses a duplicated passage
# that straddles a segment boundary (and fixed-stride OVERLAPPING
# windows only catch alignments on the stride grid); content-defined
# chunking cuts at words whose hash hits a modulus, so identical
# passages produce identical interior chunks at ANY offset — the CDC
# idea rsync/LBFS-style dedup is built on, applied at word grain.
# Still one projection + one explode + one map-side-combinable hash
# agg: the chunking itself is pure array algebra inside the row, so
# the 100-TB cost profile is identical to q_segment_dedup.
# ---------------------------------------------------------------------------

CDC_MOD = 8  # expected chunk length in words (boundary probability 1/8)


def q_cdc_segment_dedup(spark, sf_dir):
    """Alignment-invariant passage dedup: chunk boundaries at words
    whose md5-prefix ≡ 0 (mod CDC_MOD), chunks hashed and grouped
    corpus-wide. A shared passage ≥ ~2·CDC_MOD words contains shared
    interior boundaries, so its interior chunks collide regardless of
    where the passage sits in each document."""
    d = load(spark, sf_dir, "documents")
    w = _words()
    d2 = d.select("doc_id", w.alias("w"), F.size(w).alias("L"))
    is_cut = lambda word: (
        F.conv(F.substring(F.md5(word.cast("binary")), 1, 4), 16, 10)
        .cast("long") % CDC_MOD == 0)
    bnd = F.when(
        F.col("L") >= 2,
        F.filter(F.sequence(F.lit(2), F.col("L")),
                 lambda i: is_cut(F.element_at("w", i)))
    ).otherwise(F.expr("cast(array() as array<int>)"))
    d3 = d2.select("doc_id", "w", "L", bnd.alias("bnd"))
    starts = F.concat(F.array(F.lit(1)), F.col("bnd"))
    ends = F.concat(F.col("bnd"), F.array(F.col("L") + 1))
    chunks = F.zip_with(
        starts, ends,
        lambda s, e: F.array_join(F.slice("w", s, e - s), " "))
    return (
        d3.filter(F.col("L") > 0)
        .select("doc_id", F.explode(chunks).alias("chunk"))
        .withColumn("fingerprint", F.md5(F.col("chunk").cast("binary")))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("group_size"),
             F.min("doc_id").alias("min_doc_id"))
    )


SQL_CDC_SEGMENT_DEDUP = f"""
  SELECT fingerprint, COUNT(*) AS group_size, MIN(doc_id) AS min_doc_id
  FROM (
    SELECT d.doc_id,
           md5(array_to_string(
             d.w[d.starts[t.j] : d.ends[t.j] - 1], ' ')) AS fingerprint
    FROM (
      SELECT doc_id, w,
             list_concat([1], bnd) AS starts,
             list_concat(bnd, [len(w) + 1]) AS ends
      FROM (
        SELECT doc_id, w,
               CASE WHEN len(w) >= 2 THEN
                 list_filter(range(2, len(w) + 1), i ->
                   CAST(('0x' || substring(md5(w[i]), 1, 4)) AS BIGINT)
                   % {CDC_MOD} = 0)
               ELSE [] END AS bnd
        FROM (SELECT doc_id, string_split(text, ' ') AS w
              FROM documents)
      ) WHERE len(w) > 0
    ) d, UNNEST(range(1, len(d.starts) + 1)) AS t(j)
  ) GROUP BY 1
"""

# extend the doc_fingerprint driver union's oracle with the cdc_w8
# scheme (appended here because SQL_CDC_SEGMENT_DEDUP is defined
# after SQL_DOC_FINGERPRINT_ALL; the Spark side resolves the
# function lazily at call time)
SQL_DOC_FINGERPRINT_ALL = SQL_DOC_FINGERPRINT_ALL + f"""
  UNION ALL
  SELECT fingerprint, group_size, min_doc_id, 'cdc_w8' AS scheme
  FROM ({SQL_CDC_SEGMENT_DEDUP})
"""
