"""Round-3 additions: plan gates + real-Unicode coverage for the hybrid
retrieval / drift / sampling / normalization operators."""

import os
import tempfile
import unicodedata

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from distributed_deep_learning_with_apache_spark_spark.functions.text import text_normalize_nfc
from distributed_deep_learning_with_apache_spark_spark.registry import load_all

REG = load_all()


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hybrid_rrf_towers_end_in_topk(spark, sf_dir):
    # Each tower is a global top-K (TakeOrderedAndProject); the only
    # nested-loop join is the bounded 1-row query-vector broadcast plus the
    # K-row full-outer fusion — never a corpus-sized cartesian.
    plan = physical(REG["hybrid_retrieval_rrf"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_psi_window_runs_post_aggregation(spark, sf_dir):
    # The unpartitioned totals window must sit ABOVE the bin hash-agg
    # (bounded to ≤20 rows), never over the raw events scan.
    plan = physical(REG["psi_drift_events"].fn(spark, sf_dir))
    assert plan.index("Window") < plan.index("HashAggregate")  # toString is top-down


def test_zscore_hourly_agg_before_window(spark, sf_dir):
    plan = physical(REG["events_rate_anomaly_zscore"].fn(spark, sf_dir))
    assert plan.index("Window") < plan.index("HashAggregate")


def test_top_ngrams_is_take_ordered(spark, sf_dir):
    plan = physical(REG["top_ngrams_boilerplate"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # trigram build is scan-stage: no Python eval anywhere in the plan
    assert "Python" not in plan


def test_reservoir_sample_uses_window_group_limit(spark, sf_dir):
    # Exact-k-per-group must compile to WindowGroupLimit (partial top-k per
    # partition before the single group-key exchange).
    plan = physical(REG["reservoir_sample_per_group"].fn(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") == 1


def test_reservoir_sample_exact_k_per_group(spark, sf_dir):
    from pyspark.sql import functions as F

    df = REG["reservoir_sample_per_group"].fn(spark, sf_dir)
    sizes = df.groupBy("source").count().collect()
    assert sizes, "no groups sampled"
    assert all(r["count"] <= 5 for r in sizes)


def test_nfc_normalize_is_shuffle_free(spark, sf_dir):
    plan = physical(REG["text_normalize_nfc"].fn(spark, sf_dir))
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan  # the one documented Python edge, Arrow-batched


def test_nfc_normalization_real_unicode(spark):
    """The pandas-UDF NFC path must canonicalize combining sequences the
    same way DuckDB's nfc_normalize does — checked on genuinely non-ASCII
    inputs (the parquet fixture is ASCII, so this is the real coverage)."""
    samples = [
        "éclair",  # e + combining acute -> é
        "Ångström",  # ring/diaeresis combining sequences
        "ﬁ ligature\ttab",  # control char -> space
        "already  normal",
        "Å",  # ANGSTROM SIGN -> NFC maps to U+00C5
        None,
    ]
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(
            pa.table(
                {
                    "doc_id": list(range(len(samples))),
                    "text": samples,
                    "lang": ["en"] * len(samples),
                    "source": ["src0"] * len(samples),
                    "n_chars": [len(s) if s else 0 for s in samples],
                }
            ),
            os.path.join(td, "documents.parquet"),
        )
        got = {r["doc_id"]: r["norm_text"] for r in text_normalize_nfc(spark, td).collect()}
    con = duckdb.connect()
    for i, s in enumerate(samples):
        duck = con.execute(
            r"SELECT trim(regexp_replace(regexp_replace(nfc_normalize(coalesce(?, '')),"
            r" '[\x00-\x1F\x7F]', ' ', 'g'), ' +', ' ', 'g'))",
            [s],
        ).fetchone()[0]
        assert got[i] == duck, (i, s, got[i], duck)
        # and both equal Python's own NFC after the same cleanup
        py = unicodedata.normalize("NFC", s or "")
        py = "".join(" " if (ord(c) < 0x20 or ord(c) == 0x7F) else c for c in py)
        while "  " in py:
            py = py.replace("  ", " ")
        assert got[i] == py.strip(), (i, s)
    con.close()


def test_psi_total_is_small_on_stationary_fixture(spark, sf_dir):
    # The events fixture is time-stationary by construction, so total PSI
    # must land well under the 0.2 alert line — the op would be useless if
    # a stationary series tripped it.
    rows = REG["psi_drift_events"].fn(spark, sf_dir).collect()
    total = sum(r["psi_term"] for r in rows)
    assert 0.0 <= total < 0.1, total


def test_hybrid_rrf_fuses_both_towers(spark, sf_dir):
    rows = REG["hybrid_retrieval_rrf"].fn(spark, sf_dir).collect()
    assert rows
    has_both = [r for r in rows if r["lex_rank"] is not None and r["dense_rank"] is not None]
    lex_only = [r for r in rows if r["dense_rank"] is None]
    dense_only = [r for r in rows if r["lex_rank"] is None]
    # the fused list is a genuine union: at least one doc per shape at test SF
    assert lex_only or dense_only
    top = max(rows, key=lambda r: (r["rrf_score"], -r["doc_id"]))
    if has_both:
        # a doc ranked by both towers should beat any single-tower doc with
        # comparable ranks; at minimum the max-score doc is a both-tower doc
        assert top["lex_rank"] is not None and top["dense_rank"] is not None


def test_interpolation_semantics_on_constructed_gap(spark, sf_dir):
    """Pin the interpolation math itself: interpolated points must lie on
    the straight line between their observed neighbors, and observed
    points pass through unchanged."""
    rows = REG["events_value_interpolate"].fn(spark, sf_dir).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    checked = 0
    for series in by_type.values():
        series.sort(key=lambda r: r["hour"])
        for i, r in enumerate(series):
            if r["is_interpolated"] == 0:
                assert r["v_filled"] == r["v_obs"]
                continue
            assert r["v_obs"] is None
            prev = next((s for s in reversed(series[:i]) if s["is_interpolated"] == 0), None)
            nxt = next((s for s in series[i + 1 :] if s["is_interpolated"] == 0), None)
            if prev is None or nxt is None:
                # edge: forward/back fill
                anchor = prev or nxt
                assert abs(r["v_filled"] - anchor["v_filled"]) < 1e-9
                continue
            span = (nxt["hour"] - prev["hour"]).total_seconds()
            frac = (r["hour"] - prev["hour"]).total_seconds() / span
            expect = prev["v_filled"] + (nxt["v_filled"] - prev["v_filled"]) * frac
            assert abs(r["v_filled"] - expect) < 5e-4, (r, expect)
            checked += 1
    assert checked > 0, "no interior gaps in fixture — test vacuous"


def test_weighted_sample_skews_toward_weight(spark, sf_dir):
    """Efraimidis-Spirakis with weight = n_chars must over-represent long
    docs relative to the corpus mean, deterministically."""
    from pyspark.sql import functions as F

    from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table

    corpus_mean = (
        load_table(spark, sf_dir, "documents").agg(F.avg("n_chars")).first()[0]
    )
    samp = REG["sample_weighted_quality"].fn(spark, sf_dir)
    samp_mean = samp.agg(F.avg("n_chars")).first()[0]
    assert samp_mean > corpus_mean, (samp_mean, corpus_mean)
    # and the plan is a shuffle-free global top-k
    plan = physical(samp)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_hll_rollup_mergeable_and_accurate(spark, sf_dir):
    """Mergeability is the point: union-of-day-sketches must equal the
    whole-table sketch estimate exactly (same sketch family, associative
    merge), and both must land within ~3% of the true distinct count."""
    from pyspark.sql import functions as F

    from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table

    rows = REG["hll_daily_distinct_rollup"].fn(spark, sf_dir).collect()
    assert rows
    final_cum = max(rows, key=lambda r: r["day"])["distinct_users_cumulative"]

    e = load_table(spark, sf_dir, "events")
    whole = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col("user_id"), F.lit(12)))
        .cast("long")
        .alias("est"),
        F.countDistinct("user_id").alias("true_n"),
    ).first()
    assert final_cum == whole["est"], "prefix-union != whole-table sketch"
    assert abs(final_cum - whole["true_n"]) / whole["true_n"] < 0.03
    # cumulative series must be nondecreasing
    seq = [r["distinct_users_cumulative"] for r in sorted(rows, key=lambda r: r["day"])]
    assert all(a <= b for a, b in zip(seq, seq[1:]))
