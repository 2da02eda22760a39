"""Property-based differential fuzz over ADVERSARIAL CORPORA.

test_fuzz_differential.py fuzzes relational query SHAPES over the fixed
fixture; this module fuzzes the DATA: hypothesis draws hostile documents
tables (empty strings, unicode, whitespace runs, exact duplicates,
single-token docs) and the registered text/dedup queries must still
hash-match their own DuckDB oracles on that corpus. Because `queries()`
and `oracle_sql()` are parameterized by sf_dir, the very same
driver-contract pair runs on each drawn corpus — so a pass here means the
operators are correct on corpus shapes the shipped fixture never shows.

Determinism: derandomize=True; examples are a pure function of the code.
"""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from tests.oracle import compare

REG = load_all()

# Oracle-bearing queries that read ONLY the documents table.
DOC_QUERIES = [
    "dedup_exact_groups",
    "near_dup_jaccard",
    "repetition_signals",
    "text_quality",
    "token_counts",
    "doc_fingerprints",
    "top_ngrams_boilerplate",
    "text_normalize_nfc",
    "reservoir_sample_per_group",
]

WORDS = ["spark", "hash", "join", "the", "a", "scan", "émigré", "data1"]

doc_text = st.one_of(
    st.just(""),
    st.just("   "),
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
    st.text(alphabet="abéç 01\t", min_size=0, max_size=30),
)


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    texts = [draw(doc_text) for _ in range(n)]
    if n >= 2 and draw(st.booleans()):
        texts[-1] = texts[0]  # force an exact duplicate
    return texts


def _write_documents(td: str, texts: list[str]) -> None:
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": [f"src{i % 2}" for i in range(len(texts))],
                "n_chars": [len(t) for t in texts],
            }
        ),
        os.path.join(td, "documents.parquet"),
    )


@pytest.mark.parametrize("name", DOC_QUERIES)
@given(texts=corpora())
@settings(
    max_examples=4,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_doc_queries_match_oracle_on_hostile_corpora(spark, tmp_path_factory, name, texts):
    td = str(tmp_path_factory.mktemp("fuzz_corpus"))
    _write_documents(td, texts)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{td}/documents.parquet')"
    )
    try:
        q = REG[name]
        ok, msg = compare(q.fn(spark, td), con, q.oracle)
        assert ok, f"{name} on corpus {texts!r}: {msg}"
    finally:
        con.close()
