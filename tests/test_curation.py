"""Semantic invariants of the corpus-curation operators (oracle parity is
covered by the registry sweep in test_oracle_parity.py)."""

import pyspark.sql.functions as F

from distributed_deep_learning_with_apache_spark_spark.operators.curation import (
    BENCH_MOD,
    LANG_RATES_PERMILLE,
)
from distributed_deep_learning_with_apache_spark_spark.registry import load_all

REG = load_all()


def test_decontaminate_excludes_benchmark_docs(spark, sf_dir):
    out = REG["decontaminate_ngram_overlap"].fn(spark, sf_dir)
    assert out.filter(F.col("doc_id") % BENCH_MOD == 0).count() == 0
    bad = out.filter(
        (F.col("n_overlap") > F.col("n_shingles"))
        | (F.col("overlap_share") < 0)
        | (F.col("overlap_share") > 1)
    )
    assert bad.count() == 0


def test_chunk_dedup_keeps_exactly_one_per_distinct_chunk(spark, sf_dir):
    out = REG["chunk_dedup_c4"].fn(spark, sf_dir)
    rows = out.agg(F.sum("n_kept"), F.sum("n_chunks")).collect()[0]
    kept, total = rows[0], rows[1]
    assert 0 < kept <= total
    # n_kept across the corpus == number of distinct chunk texts
    from distributed_deep_learning_with_apache_spark_spark.functions.text import tokens
    from distributed_deep_learning_with_apache_spark_spark.operators.curation import CHUNK_TOKENS
    from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", tokens("text").alias("t"))
    n_chunks = F.ceil(F.size("t") / F.lit(float(CHUNK_TOKENS))).cast("long")
    distinct_chunks = (
        d.filter(F.size("t") > 0)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.array_join(F.slice(F.col("t"), i * CHUNK_TOKENS + 1, CHUNK_TOKENS), " "),
                )
            ).alias("c")
        )
        .distinct()
        .count()
    )
    assert kept == distinct_chunks


def test_stratified_hash_rates_and_determinism(spark, sf_dir):
    q = REG["sample_stratified_hash"]
    a = sorted(r.doc_id for r in q.fn(spark, sf_dir).collect())
    b = sorted(r.doc_id for r in q.fn(spark, sf_dir).collect())
    assert a == b and a  # deterministic, non-empty

    from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table

    totals = {
        r.lang: r.n
        for r in load_table(spark, sf_dir, "documents").groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    kept = {r.lang: r.n for r in q.fn(spark, sf_dir).groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, permille in LANG_RATES_PERMILLE.items():
        if totals.get(lang, 0) >= 50:
            observed = kept.get(lang, 0) / totals[lang]
            # md5 buckets are uniform; allow generous tolerance at small n
            assert abs(observed - permille / 1000) < 0.15, (lang, observed, permille)


def test_repetition_signals_bounds_and_repetitive_doc(spark, sf_dir):
    out = REG["repetition_signals"].fn(spark, sf_dir)
    bad = out.filter(
        (F.col("top_token_share") <= 0)
        | (F.col("top_token_share") > 1)
        | (F.col("dup_2gram_frac") < 0)
        | (F.col("dup_2gram_frac") > 1)
    )
    assert bad.count() == 0
    # a maximally repetitive synthetic doc scores ~1 on both signals
    from distributed_deep_learning_with_apache_spark_spark.functions.text import tokens

    df = spark.createDataFrame([(0, "spam " * 50)], "doc_id long, text string")
    tok = tokens("text")
    length = F.greatest(F.size(tok) - 1, F.lit(0))
    g2 = F.zip_with(F.slice(tok, 1, length), F.slice(tok, 2, length), lambda x, y: F.concat_ws(" ", x, y))
    row = df.select(
        (F.size(F.array_distinct(g2)) / F.size(g2)).alias("distinct_frac")
    ).collect()[0]
    assert row.distinct_frac < 0.05


def test_image_phash_neardup_clusters_by_label(spark):
    """aHash banded-hamming near-dup over REAL decoded pixels: jittered
    same-glyph images must dominate the pair set (the multimodal analog of
    the text near-dup recall checks)."""
    from distributed_deep_learning_with_apache_spark_spark.registry import load_all

    rows = load_all()["image_phash_neardup"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 50
    assert all(r.hamming <= 6 for r in rows)
    same = sum(1 for r in rows if r.path_a.split("/")[-2] == r.path_b.split("/")[-2])
    assert same / len(rows) >= 0.8, same / len(rows)


def test_pii_scrub_properties(spark, sf_dir):
    from distributed_deep_learning_with_apache_spark_spark.registry import load_all

    rows = load_all()["pii_scrub"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # every doc gets one injected email and one injected IP; phones on
        # every 3rd doc — the scrub must find exactly what was injected
        # (the corpus text itself contains none)
        assert r.n_email == 1, r
        assert r.n_ip == 1, r
        assert r.n_phone == (1 if r.doc_id % 3 == 0 else 0), r


def test_dedup_incremental_survivors_are_fresh_and_unique(spark, sf_dir):
    import pyspark.sql.functions as F

    from distributed_deep_learning_with_apache_spark_spark.registry import load_all
    from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table

    out = load_all()["dedup_incremental"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows
    fps = [r.fp for r in rows]
    assert len(fps) == len(set(fps)), "survivors must be unique by fingerprint"
    hist = {
        r.fp
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 < 8)
        .select(F.md5("text").alias("fp"))
        .distinct()
        .collect()
    }
    assert not (set(fps) & hist), "no survivor may exist in the historical store"


def test_clip_outliers_clips_about_two_percent(spark, sf_dir):
    from distributed_deep_learning_with_apache_spark_spark.registry import load_all

    rows = load_all()["clip_outliers_winsorize"].fn(spark, sf_dir).collect()
    total = sum(r.n for r in rows)
    clipped = sum(r.n_clipped for r in rows)
    # 1st + 99th percentile clamp -> ~2% of rows clipped overall
    assert 0.005 <= clipped / total <= 0.04, clipped / total
