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

# Extended-fuzz knob: SG_FUZZ_MULT=N multiplies every max_examples
# (derandomized generation explores a longer deterministic prefix).
FUZZ_MULT = int(os.environ.get("SG_FUZZ_MULT", "1"))

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
    "lang_id",
    "vocab_filter_truncate",
    "tfidf_top_terms",
    "bm25_topk",
    "inverted_index_postings",
    "simhash_fingerprints",
    "chunk_overlapping",
    "length_bucket_packing",
    "sample_weighted_quality",
    "near_dup_containment",
    "near_dup_containment_stopfiltered",
    "near_dup_edit_distance",
    "near_dup_prefix_filter_jaccard",  # r9b: lossless PPJoin prefix pruning
    "udtf_chunk_spans",
    # full dedup/curation family (crashes on token-less docs were found
    # here: ANSI element_at and negative-length slice)
    "minhash_lsh_candidates",
    "near_dup_jaccard_stopfiltered",  # r12-opt s3: hashed posting+verify vs string oracle
    "near_dup_minhash_verified",
    "simhash_near_dup_pairs",
    "simhash64_near_dup_pairs",
    "dedup_clusters",
    "dedup_cluster_survivors",
    "dedup_exact_survivors",
    "chunk_dedup_c4",
    "pack_sequences",
    "quality_tiers",
    "pii_scrub",
    "decontaminate_ngram_overlap",
    "corpus_curation_pipeline",
    "bigram_lm_quality",
    "zipf_fit",
    "substring_span_dedup",
    "mix_domains_to_target",
    "sample_stratified_hash",
    "dedup_incremental",
    "near_dup_incremental",  # r6: persisted-band-index probe (split + anti-join)
    "near_dup_index_append_cycle",  # r6: append lifecycle self-match
    "near_dup_retract_reprobe",  # r12: tombstone overlay == true deletion
    "near_dup_compact_tombstones",  # r12: compaction == overlay, file surgery
    "tokenize_truncate",
    "corpus_token_stats",
    "heavy_hitters_sketch_verified",
    "map_in_arrow_bytes",
    # r5: collation + ANSI-safe surfaces (need the mixed-case draws below)
    "collated_token_counts",
    "ansi_safe_doc_ratios",
    "leakage_safe_splits",
    "temperature_mixture_weights",
    "bigram_perplexity_score",  # r7: corpus-trained bigram LM filter
    "token_budget_top_p",  # r7: integer cumulative-budget cutoff
    "doc_code_detection",  # r7: character-class density routing
    "lsh_band_tuning_profile",  # r8: banding workload profile
    "vocab_oov_rate",  # r8: frequency-vocab coverage report
]

WORDS = ["spark", "hash", "join", "the", "a", "scan", "émigré", "data1", "Spark", "THE"]

doc_text = st.one_of(
    st.none(),  # NULL text — r4 advice: udtf_chunk_spans diverged on NULL
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
                "n_chars": [len(t) if t is not None else None for t in texts],
            },
            # Explicit schema: an all-NULL text draw must still type the
            # column string, not pyarrow's inferred null type.
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("text", pa.string()),
                    ("lang", pa.string()),
                    ("source", pa.string()),
                    ("n_chars", pa.int64()),
                ]
            ),
        ),
        os.path.join(td, "documents.parquet"),
    )


@pytest.mark.parametrize("name", DOC_QUERIES)
@given(texts=corpora())
@settings(
    max_examples=4 * FUZZ_MULT,
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


# ---------------------------------------------------------------------------
# Events-table fuzz: hostile time series through the windowed/resample ops
# ---------------------------------------------------------------------------
EVENT_QUERIES = [
    "events_tumbling_hourly",
    "events_sessionized",
    "events_latest_per_user_type",
    "events_hourly_gapfill",
    "events_value_interpolate",
    "events_props_variant",
    "events_props_json",
    "events_funnel",
    "events_retention_cohorts",
    "events_rate_anomaly_zscore",
    "psi_drift_events",
    "events_sliding_1h_30m",
    "stream_foreachbatch_merge",
    "events_ohlc_hourly",
    "source_xml_events_agg",
    "locf_forward_fill",
    "events_session_window_builtin",  # r6: built-in session merge semantics
    "events_local_hour_histogram",  # r6: IANA tz conversion parity
    "attribution_last_touch",  # r6: conditional running-max attribution
    "dq_quarantine_split",  # r6: precedence-ordered dead-letter routing
    "kmv_user_overlap_sketch",  # r7: bottom-k distinct/intersection sketch
    "stream_kmv_distinct_running",  # r7: streaming bottom-k state merge
    "ml_prefixspan_event_paths",  # r7: order-aware pattern supports
    "sessionize_with_terminators",  # r7: custom-boundary gaps-and-islands
    "retention_policy_sweep",  # r7: TTL + legal-hold routing
    "markov_event_transitions",  # r7: lead() pair counts + one division
    "funnel_stage_durations",  # r7: stage-latency percentiles
    "ab_test_lift_ztest",  # r7: degenerate-conversion z guard
    "countmin_estimate_profile",  # r8: portable-hash CM estimates
    "out_of_order_lateness_histogram",  # r8: arrival-order lateness buckets
    "running_distinct_users_daily",  # r8: first-seen prefix-sum growth curve
    "stream_countmin_running",  # r8: streaming mergeable CM watchlist
    "json_schema_profile",  # r8: dynamic JSON key/type discovery
    "user_event_entropy",  # r9b: milli-nat entropy (single-term degenerates)
    "bitmap_distinct_users",  # r9b: presence-word popcount counting
    "stream_bitmap_distinct_running",  # r9b: per-batch bit_or state merge
]

import datetime as _dt

event_times = st.integers(min_value=0, max_value=3600 * 24 * 3 - 1)  # 3-day span, s
props_values = st.one_of(
    st.just('{"k": 1}'),
    st.just('{"k": 777}'),
    st.just('{"x": 9}'),  # key absent -> NULL extraction on both engines
    st.just("{}"),
)


@st.composite
def event_tables(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    rows = []
    for i in range(n):
        t = draw(event_times)
        rows.append(
            {
                "event_id": i,
                "ts": _dt.datetime(2024, 3, 1) + _dt.timedelta(seconds=t),
                "user_id": draw(st.integers(min_value=0, max_value=2)),
                "event_type": draw(st.sampled_from(["click", "error"])),
                "value": draw(st.sampled_from([0.01, 5.5, 123.45, 499.99])),
                "props": draw(props_values),
            }
        )
    if n >= 2 and draw(st.booleans()):
        rows[-1]["ts"] = rows[0]["ts"]  # force an exact timestamp tie
        rows[-1]["user_id"] = rows[0]["user_id"]
    return rows


def _write_events(td: str, rows) -> None:
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
                "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
                "event_type": pa.array([r["event_type"] for r in rows]),
                "value": pa.array([r["value"] for r in rows], pa.float64()),
                "props": pa.array([r["props"] for r in rows]),
            }
        ),
        os.path.join(td, "events.parquet"),
    )


@pytest.mark.parametrize("name", EVENT_QUERIES)
@given(rows=event_tables())
@settings(
    max_examples=4 * FUZZ_MULT,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_event_queries_match_oracle_on_hostile_series(spark, tmp_path_factory, name, rows):
    td = str(tmp_path_factory.mktemp("fuzz_events"))
    _write_events(td, rows)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{td}/events.parquet')")
    try:
        q = REG[name]
        ok, msg = compare(q.fn(spark, td), con, q.oracle)
        assert ok, f"{name} on {len(rows)} rows: {msg}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# Embeddings-table fuzz: FP-fold parity on hostile vectors
# ---------------------------------------------------------------------------
EMB_QUERIES = [
    "embedding_drift_by_label",  # r6: fixed-point centroid drift
    "pca_power_iteration_quantized",  # r8: all-zero draws exercise the greatest(m,1) guard
    "embedding_l2_normalized",
    "embedding_quantize_int8",
    "embedding_dim_means",
    "embedding_argmax",
    "vector_scalar_ops",
]

vec_component = st.sampled_from([0.0, 1.0, -1.0, 0.5, -0.25, 123.456, 1e-6, -1e-6])


@st.composite
def embedding_tables(draw):
    n = draw(st.integers(min_value=1, max_value=6))
    dim = 64  # fixture dim: the array ops assume it
    vecs = [[draw(vec_component) for _ in range(dim)] for _ in range(n)]
    if draw(st.booleans()):
        vecs[0] = [0.0] * dim  # the all-zero vector: L2-normalize's edge
    return vecs


def _write_embeddings(td: str, vecs) -> None:
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([i % 3 for i in range(len(vecs))], pa.int32()),
            }
        ),
        os.path.join(td, "embeddings.parquet"),
    )


@pytest.mark.parametrize("name", EMB_QUERIES)
@given(vecs=embedding_tables())
@settings(
    max_examples=4 * FUZZ_MULT,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_embedding_queries_match_oracle_on_hostile_vectors(
    spark, tmp_path_factory, name, vecs
):
    td = str(tmp_path_factory.mktemp("fuzz_emb"))
    _write_embeddings(td, vecs)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{td}/embeddings.parquet')"
    )
    try:
        q = REG[name]
        ok, msg = compare(q.fn(spark, td), con, q.oracle)
        assert ok, f"{name} on {len(vecs)} vectors: {msg}"
    finally:
        con.close()


# Cosine-scoring family: nonzero vectors (the documented precondition —
# similarity.py normalizes and drops dead embeddings first), plus an
# id-aligned documents table for semantic_dedup.
EMB_COSINE_QUERIES = [
    "cosine_topk_exact",
    "cosine_topk_filtered",  # r6: pre-filtered ANN
    "ann_lsh_bucketed",
    "ann_lsh_multiprobe",
    "ann_ivf_by_label",
    "near_dup_cosine_pairs",
    "ann_matryoshka_refine",
    "last_timestep_select",
    "hstack_features",
    "anomaly_best_worst",
    "semantic_dedup",
]


@st.composite
def nonzero_embedding_tables(draw):
    n = draw(st.integers(min_value=2, max_value=10))
    vecs = []
    for i in range(n):
        v = [draw(vec_component) for _ in range(64)]
        if all(x == 0.0 for x in v):
            v[i % 64] = 1.0
        vecs.append(v)
    return vecs


@pytest.mark.parametrize("name", EMB_COSINE_QUERIES)
@given(vecs=nonzero_embedding_tables())
@settings(
    max_examples=3 * FUZZ_MULT,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cosine_family_matches_oracle_on_hostile_vectors(spark, tmp_path_factory, name, vecs):
    td = str(tmp_path_factory.mktemp("fuzz_cos"))
    _write_embeddings(td, vecs)
    _write_documents(td, [f"doc {i} words here" for i in range(len(vecs))])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{td}/embeddings.parquet')"
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{td}/documents.parquet')"
    )
    try:
        q = REG[name]
        ok, msg = compare(q.fn(spark, td), con, q.oracle)
        assert ok, f"{name} on {len(vecs)} vectors: {msg}"
    finally:
        con.close()
