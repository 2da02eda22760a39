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
