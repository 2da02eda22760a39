"""Cross-engine tokenizer parity on adversarial inputs.

Every text query's oracle equivalence rests on Spark's
`split(lower(text), '[^a-z0-9]+')` (Java regex) agreeing with DuckDB's
`string_split_regex` (RE2) — including empty-token filtering. This pins
that agreement on the inputs most likely to diverge: unicode, emoji,
combining marks, digits-only, punctuation-only, empty, long runs.
"""

import duckdb
import pytest

from distributed_deep_learning_with_apache_spark_spark.functions.text import (
    DUCK_TOKENS,
    tokens,
)

TRICKY = [
    "",
    " ",
    "hello world",
    "HELLO WORLD",
    "   leading and trailing   ",
    "punct!!!only???",
    "...",
    "123 456seven 8nine",
    "tabs\tand\nnewlines\r\nmixed",
    "hyphen-ated under_scored dot.sep",
    "émigré naïve café",  # accented latin (lowercased but split on non-ascii)
    "日本語テキスト mixed with english",
    "emoji 🙂 inside 🚀 text",
    "ZWJ‍sequence",
    "combining áccent",
    "a" * 500,
    ("word " * 300).strip(),
    "MiXeD123CaSe456",
    "'quoted' \"double\" `backtick`",
    "null\x00byte",
]


def test_tokenizer_matches_duckdb(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(TRICKY)], "doc_id long, text string")
    spark_toks = {r.doc_id: list(r.t) for r in df.select("doc_id", tokens("text").alias("t")).collect()}

    con = duckdb.connect()
    con.register("documents", __import__("pandas").DataFrame({"doc_id": range(len(TRICKY)), "text": TRICKY}))
    duck_toks = {
        r[0]: list(r[1])
        for r in con.execute(
            f"SELECT doc_id, {DUCK_TOKENS.format(col='text')} FROM documents"
        ).fetchall()
    }
    diffs = {i: (spark_toks[i], duck_toks[i]) for i in spark_toks if spark_toks[i] != duck_toks[i]}
    assert not diffs, f"tokenizer divergence on {len(diffs)} inputs: {dict(list(diffs.items())[:3])}"


def test_tokenizer_null_safety(spark):
    df = spark.createDataFrame([(0, None), (1, ""), (2, "ok text")], "doc_id long, text string")
    rows = {r.doc_id: list(r.t) for r in df.select("doc_id", tokens("text").alias("t")).collect()}
    assert rows[0] == [] and rows[1] == []
    assert rows[2] == ["ok", "text"]

    con = duckdb.connect()
    con.register(
        "documents",
        __import__("pandas").DataFrame({"doc_id": [0, 1, 2], "text": [None, "", "ok text"]}),
    )
    drows = {
        r[0]: list(r[1])
        for r in con.execute(
            f"SELECT doc_id, {DUCK_TOKENS.format(col='text')} FROM documents"
        ).fetchall()
    }
    assert drows == rows


# ---------------------------------------------------------------------------
# BPE subword tokenizer (Sennrich et al. 2016)
# ---------------------------------------------------------------------------
def test_bpe_learns_textbook_merges():
    from distributed_deep_learning_with_apache_spark_spark.functions.text import (
        BPE_END,
        _bpe_encode_word,
        _bpe_train,
    )

    merges = _bpe_train([("lower", 5), ("lowest", 3), ("newer", 6), ("wider", 2)], 10)
    # the highest-count adjacent pair in the weighted corpus merges first
    assert merges[0] == ("w", "e")
    ranks = {p: i for i, p in enumerate(merges)}
    # frequent in-vocab word fuses fully
    assert _bpe_encode_word("lower", ranks) == ["lower" + BPE_END]
    # unseen word decomposes into learned subwords + leftover chars
    parts = _bpe_encode_word("newest", ranks)
    assert len(parts) > 1
    # roundtrip: concatenation restores the word + end marker
    assert "".join(parts) == "newest" + BPE_END


def test_bpe_train_deterministic_under_tie():
    from distributed_deep_learning_with_apache_spark_spark.functions.text import _bpe_train

    # 'ab' and 'cd' pairs tie at count 3 -> lexicographically smaller wins
    m1 = _bpe_train([("ab", 3), ("cd", 3)], 1)
    m2 = _bpe_train([("cd", 3), ("ab", 3)], 1)
    assert m1 == m2 == [("a", "b")]


def test_bpe_corpus_stats_contract(spark, sf_dir):
    from distributed_deep_learning_with_apache_spark_spark.functions.text import (
        BPE_END,
        _bpe_encode_word,
        train_bpe_on_corpus,
    )
    from distributed_deep_learning_with_apache_spark_spark.registry import load_all

    reg = load_all()
    rows = reg["bpe_tokenize_stats"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # every word yields >= 1 subword; ratio consistent with the counts
        assert r.n_subwords >= r.n_words
        if r.n_words:
            assert r.subwords_per_word == round(r.n_subwords / r.n_words, 6)

    # roundtrip property on the real learned merges
    merges = train_bpe_on_corpus(spark, sf_dir)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("fast", "slow", "window", "aggregate"):
        assert "".join(_bpe_encode_word(w, ranks)) == w + BPE_END


def test_bpe_stats_deterministic(spark, sf_dir):
    from distributed_deep_learning_with_apache_spark_spark.registry import load_all

    q = load_all()["bpe_tokenize_stats"]
    a = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
    assert a == b
