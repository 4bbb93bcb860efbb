"""Round-6 optimization pins: the rewrites must not change what the
operators compute, and the scale-safety properties they added must
hold (bounded driver collects, no-op spreading at scale, identical
lang_id semantics vs the pre-rewrite shape)."""

import os
import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from derzis_spark import pipeline_queries as P


@pytest.fixture(scope="module")
def docs_dir(spark):
    """A corpus crafted for the lang_id edge cases: ties, unknowns,
    sub-3-char texts, and a high-cardinality group column (the source
    field doubles as the corpus_mix group)."""
    rows = []
    # trigram-rich per-language texts
    samples = {
        "en": "the thing and the other thing went to the end of it",
        "es": "la casa de la que es el lado bueno de la cosa que ado",
        "de": "der ich sche die und ein ung gen ten cht die der und",
        "fr": "le les et la eur ait ais ou pa our qu' ent le re les",
    }
    i = 0
    for lang, text in samples.items():
        for _ in range(5):
            rows.append((i, text, lang, f"g{i % 100}", len(text)))
            i += 1
    # unknown: no profile trigram in prefix; and sub-3-char text
    rows.append((i, "zzz qqq xxx", "en", f"g{i % 100}", 11)); i += 1
    rows.append((i, "ab", "en", f"g{i % 100}", 2)); i += 1
    # tie case: 'en ' + 'er ' (de) vs ' th'+'the'+'he ' (en) balanced
    rows.append((i, "then er ", "de", f"g{i % 100}", 8)); i += 1
    d = tempfile.mkdtemp(prefix="r6docs_")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet"))
    return d


def _lang_id_reference(spark, sf_dir):
    """The pre-r6 explode + broadcast-profile-join + window-argmax
    shape, kept verbatim as the semantic reference."""
    from derzis_spark.queries import load
    d = load(spark, sf_dir, "documents")
    t = F.lower(F.substring(F.col("text"), 1, P.LANG_ID_PREFIX))
    d2 = d.select("doc_id", F.col("lang").alias("declared"), t.alias("t"))
    tris = F.when(
        F.length("t") >= 3,
        F.expr("transform(sequence(1, length(t) - 2),"
               " i -> substring(t, i, 3))")
    ).otherwise(F.expr("cast(array() as array<string>)"))
    ex = (d2.select("doc_id", tris.alias("tris"))
          .select("doc_id", F.explode("tris").alias("tri")))
    prof = spark.createDataFrame(
        [(lang, g) for lang, gs in sorted(P.LANG_TRIGRAMS.items())
         for g in gs],
        "plang string, tri string")
    scores = (ex.join(F.broadcast(prof), "tri")
              .groupBy("doc_id", "plang")
              .agg(F.count("*").alias("score")))
    best = (scores.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("doc_id")
            .orderBy(F.desc("score"), F.asc("plang"))))
        .filter(F.col("rn") == 1).select("doc_id", "plang"))
    return (
        d2.join(best, "doc_id", "left")
        .select("declared",
                F.coalesce("plang", F.lit("unknown")).alias("predicted"))
        .groupBy("declared", "predicted")
        .agg(F.count("*").alias("n"))
    )


def test_lang_id_rowlocal_matches_reference_shape(spark, docs_dir):
    got = sorted(tuple(r) for r in P.q_lang_id(spark, docs_dir).collect())
    exp = sorted(tuple(r)
                 for r in _lang_id_reference(spark, docs_dir).collect())
    assert got == exp
    # the crafted corpus exercises unknowns
    assert any(r[1] == "unknown" for r in got)


def test_corpus_mix_collect_is_weights_bounded(spark, docs_dir):
    """Mixing on a high-cardinality column must not materialize more
    than O(|weights|) rows on the driver: the thresholds dict (the
    direct image of the collect) carries only the weighted keys."""
    from derzis_spark.queries import load
    d = load(spark, docs_dir, "documents").select("doc_id", "source")
    weights = {"g0": 0.5, "g1": 0.3, "g2": 0.2}
    out, thr = P.corpus_mix(spark, d, "source", weights)
    assert set(thr) == set(weights)  # never one entry per distinct group
    got = {r["source"] for r in out.select("source").distinct().collect()}
    assert got <= set(weights)
    # selection identical to the pre-r6 join+filter form
    thr_df = spark.createDataFrame(
        [(g, t) for g, t in thr.items()], "source string, thr long")
    ref = (d.join(F.broadcast(thr_df), "source", "left")
           .filter(P._mix_hash_col() < F.coalesce("thr", F.lit(0)))
           .drop("thr"))
    # the join form reorders columns (key first); compare by name
    cols = ["doc_id", "source"]
    assert sorted(map(tuple, out.select(*cols).collect())) == \
        sorted(map(tuple, ref.select(*cols).collect()))


def test_mix_rates_zero_weight_group_is_dropped():
    """ADVICE r5: a 0.0-weight group with rows used to raise
    ZeroDivisionError inside the total computation."""
    thr = P.mix_rates({"a": 100, "b": 50}, {"a": 1.0, "b": 0.0})
    assert thr["b"] == 0 and thr["a"] == P.MIX_HASH_MOD


def test_spread_is_noop_at_scale_and_spreads_locally(spark):
    par = spark.sparkContext.defaultParallelism
    few = spark.range(100).coalesce(1)
    assert P._spread(few).rdd.getNumPartitions() == par
    many = spark.range(1000).repartition(par)
    # already at (or above) parallelism: the frame passes through
    assert P._spread(many) is many


def test_minhash_distinct_tokens_identity(spark):
    """MinHash signatures over ``array_distinct`` of the token array
    must equal signatures over the raw multiset (min is insensitive to
    duplicates) — pinned on a repeat-heavy corpus where any multiset
    dependence would show."""
    import os as _os
    import tempfile as _tf
    rows = [
        (0, "a b a b a b a b c", "en", "s0", 17),
        (1, "c c c c c c b", "en", "s0", 13),
        (2, "x y z x y z x y z", "en", "s1", 17),
        (3, "single", "en", "s1", 6),
    ]
    d = _tf.mkdtemp(prefix="r6mh_")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        _os.path.join(d, "documents.parquet"))
    for fn in (P.q_minhash_signatures, P.q_minhash64_signatures,
               P.q_minhash64_signatures_fast):
        got = sorted(map(tuple, fn(spark, d).collect()))
        # reference: the pre-r6 multiset form — same aggs over the
        # raw (non-distinct) token explode
        from derzis_spark.queries import load
        docs = load(spark, d, "documents")
        raw = docs.select("doc_id", F.explode(F.split("text", " "))
                          .alias("w"))
        if fn is P.q_minhash_signatures:
            aggs = [F.min(F.md5(F.concat(F.lit(str(h)), F.col("w"))
                                .cast("binary"))).alias(f"s{h}")
                    for h in range(P.N_MINHASH)]
            wide = raw.groupBy("doc_id").agg(*aggs)
            ref = wide.select(
                "doc_id",
                F.posexplode(F.array(
                    *[F.col(f"s{h}") for h in range(P.N_MINHASH)]))
                .alias("h", "sig")).select(
                "doc_id", F.col("h").cast("long").alias("h"), "sig")
        else:
            bm = (P._token_base_col(F.col("w"))
                  if fn is P.q_minhash64_signatures else
                  F.pmod(F.xxhash64(F.col("w")), F.lit(P.MINHASH64_P)))
            toks = raw.select("doc_id", bm.alias("bm"))
            aggs = [F.min((F.lit(a) * F.col("bm") + F.lit(b))
                          % F.lit(P.MINHASH64_P)).alias(f"s{i}")
                    for i, (a, b) in enumerate(P.MINHASH64_AB)]
            wide = toks.groupBy("doc_id").agg(*aggs)
            ref = wide.select(
                "doc_id",
                F.posexplode(F.array(
                    *[F.col(f"s{i}") for i in range(P.N_MINHASH64)]))
                .alias("h", "sig")).select(
                "doc_id", F.col("h").cast("int").alias("h"), "sig")
        exp = sorted(map(tuple, ref.collect()))
        assert got == exp, fn.__name__


def test_tfidf_df_from_tf_identity(spark, docs_dir):
    """df(term) derived from tf must equal the explicit
    explode(array_distinct(words)) count."""
    from derzis_spark.queries import load
    d = load(spark, docs_dir, "documents")
    base = d.select("doc_id", F.split("text", " ").alias("w"))
    via_tf = (base.select("doc_id", F.explode("w").alias("term"))
              .groupBy("doc_id", "term").count()
              .groupBy("term").agg(F.count("*").alias("df")))
    explicit = (base.select(
        "doc_id", F.explode(F.array_distinct("w")).alias("term"))
        .groupBy("term").agg(F.count("*").alias("df")))
    assert sorted(map(tuple, via_tf.collect())) == \
        sorted(map(tuple, explicit.collect()))
