"""Round-12 new lifecycle operator (r11 VERDICT missing #1 / next #2):

`ann_ivf_pq_append_batch` closes the composed IVF×PQ serve-after-append
lifecycle: both stores (cell assignments + PQ codes) grow append-only,
appended vectors are ADC-retrievable without the full-corpus re-encode,
and the appended codes are bit-identical to what a fresh encode with the
persisted codebooks produces (the determinism that makes append == the
incremental prefix of a rebuild with the same codebooks).
"""

import json
import os
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from distributed_deep_learning_with_apache_spark_spark.registry import load_all
from distributed_deep_learning_with_apache_spark_spark.sources.catalog import load_table

REG = load_all()


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ann_ivf_pq_append_contract_and_recall(spark, sf_dir):
    """The registered op passes its in-op gates (immutability +
    completeness raise on violation) and the served post-append recall
    holds the composed stack's standing floor."""
    from distributed_deep_learning_with_apache_spark_spark.operators.similarity import (
        IVF_K,
        IVF_NPROBE,
        N_QUERIES,
        TOP_K,
    )

    out = REG["ann_ivf_pq_append_batch"].fn(spark, sf_dir)
    assert set(out.columns) == {"query_id", "neighbor_id", "adc_dist", "rnk"}
    counts = out.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    assert all(r.n <= TOP_K for r in counts)
    approx = _topk_sets(out)
    assert len(approx) == N_QUERIES
    exact = _topk_sets(REG["cosine_topk_exact"].fn(spark, sf_dir))
    hits = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
    recall = hits / (len(exact) * TOP_K)
    # the composed IVF×PQ floor: IVF cell pruning × PQ misranking — same
    # bar the non-append ann_ivf_pq_adc holds (test_ann_recall.py)
    assert recall >= 0.5 * IVF_NPROBE / IVF_K, f"post-append recall {recall:.2f}"


@pytest.fixture(scope="module")
def pq_history_store(spark, sf_dir):
    """A private PQ code store over the history 90% (the op's split),
    reclaimed after the module."""
    from distributed_deep_learning_with_apache_spark_spark.operators.similarity import (
        N_QUERIES,
        pq_encode_df,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    is_batch = (F.col("vec_id") % 10 == 9) & (F.col("vec_id") >= N_QUERIES)
    work = tempfile.mkdtemp(prefix="sg_r12_pq_store_")
    shutil.rmtree(work)
    pq_encode_df(spark, sf_dir, root=work, source=e.filter(~is_batch))
    yield work, e.filter(is_batch)
    shutil.rmtree(work, ignore_errors=True)


def test_append_pq_codes_bit_identical_to_fresh_encode(spark, sf_dir, pq_history_store):
    """Appended codes == a fresh `_pq_encode_with_books` of the same batch
    with the PERSISTED codebooks: the encoder is deterministic given the
    codebooks, so the appended store is exactly the incremental prefix of
    a rebuild that reuses them — no quantization drift from the append
    path itself."""
    from distributed_deep_learning_with_apache_spark_spark.operators.similarity import (
        _pq_encode_with_books,
        append_pq_codes,
        as_double,
    )

    root, batch = pq_history_store
    append_pq_codes(spark, root, batch)
    with open(os.path.join(root, "codebooks.json")) as f:
        books = [np.asarray(b) for b in json.load(f)]
    batch_ids = [r.vec_id for r in batch.select("vec_id").collect()]
    stored = {
        r.vec_id: list(r.codes)
        for r in spark.read.parquet(os.path.join(root, "codes"))
        .filter(F.col("vec_id").isin(batch_ids))
        .collect()
    }
    fresh = {
        r.vec_id: list(r.codes)
        for r in _pq_encode_with_books(
            spark, batch.select("vec_id", as_double("embedding").alias("v")), books
        ).collect()
    }
    assert set(stored) == set(batch_ids)
    assert stored == fresh


def test_append_pq_codes_rejects_null_and_empty(spark, pq_history_store):
    from distributed_deep_learning_with_apache_spark_spark.operators.similarity import (
        append_pq_codes,
    )

    root, _batch = pq_history_store
    for bad_vec in (None, []):
        bad = spark.createDataFrame(
            [(20_000_001, bad_vec)], "vec_id long, embedding array<double>"
        )
        with pytest.raises(Exception, match="append_pq_codes|ASSERT"):
            append_pq_codes(spark, root, bad)


# ---------------------------------------------------------------------------
# source_text_wholetext_labels (S2/S3 wholetext closure)
# ---------------------------------------------------------------------------
def test_wholetext_source_matches_documents_and_needs_wholetext(spark, sf_dir):
    """The whole-file scan reproduces the documents table's per-label
    measures, and wholetext is LOAD-BEARING: the same tree read in line
    mode yields 2 rows per file, so neither the doc count nor the
    trailer-parse can match."""
    from distributed_deep_learning_with_apache_spark_spark.sources.binary import (
        materialize_wholetext_tree,
    )

    out = {r.label: r for r in REG["source_text_wholetext_labels"].fn(spark, sf_dir).collect()}
    d = load_table(spark, sf_dir, "documents")
    exp = {
        r.label: r
        for r in d.groupBy(
            F.when(F.col("doc_id") % 2 == 0, "pos").otherwise("neg").alias("label")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.length(
                    F.concat(F.col("text"), F.lit("\ndoc:"), F.col("doc_id").cast("string"))
                )
            ).alias("total_chars"),
            F.sum("doc_id").alias("sum_doc_id"),
        )
        .collect()
    }
    assert set(out) == {"pos", "neg"}
    for lab in ("pos", "neg"):
        assert out[lab].n_docs == exp[lab].n_docs
        assert out[lab].total_chars == exp[lab].total_chars
        assert out[lab].sum_doc_id == exp[lab].sum_doc_id
    # line-mode twin: one row per LINE — double the rows, zero intact docs
    root = materialize_wholetext_tree(spark, sf_dir)
    line_rows = (
        spark.read.format("text")
        .option("pathGlobFilter", "doc*.txt")
        .option("recursiveFileLookup", "true")
        .load(root)
        .count()
    )
    assert line_rows == 2 * sum(r.n_docs for r in out.values())


def test_wholetext_tree_is_cached_and_labeled_by_parity(spark, sf_dir):
    import glob

    from distributed_deep_learning_with_apache_spark_spark.sources.binary import (
        materialize_wholetext_tree,
    )

    root1 = materialize_wholetext_tree(spark, sf_dir)
    root2 = materialize_wholetext_tree(spark, sf_dir)  # marker short-circuit
    assert root1 == root2
    pos = glob.glob(os.path.join(root1, "pos", "*.txt"))
    neg = glob.glob(os.path.join(root1, "neg", "*.txt"))
    assert pos and neg
    assert all(int(os.path.basename(p)[3:-4]) % 2 == 0 for p in pos)
    assert all(int(os.path.basename(p)[3:-4]) % 2 == 1 for p in neg)


# ---------------------------------------------------------------------------
# retraction lifecycle: near_dup_retract_reprobe + ann_ivf_delete_serve
# ---------------------------------------------------------------------------
def test_retract_reprobe_readmits_and_matches_oracle_semantics(spark, sf_dir):
    """Deleting history docs re-admits batch docs whose only near-dup
    partners were deleted: fresh(retracted) must be a STRICT superset of
    fresh(full store) on the fixture (measured: +2 at sf0.001, +3 at
    sf0.01 with RETRACT_MOD=5). Hash parity vs the from-scratch SQL
    evaluation is pinned by the parity sweeps (R12 driver rotation)."""
    full = {r.doc_id for r in REG["near_dup_incremental"].fn(spark, sf_dir).collect()}
    retracted = {
        r.doc_id for r in REG["near_dup_retract_reprobe"].fn(spark, sf_dir).collect()
    }
    assert retracted > full, (len(retracted), len(full))


def test_ann_delete_serve_excludes_tombstones_and_keeps_recall(spark, sf_dir):
    from distributed_deep_learning_with_apache_spark_spark.operators.similarity import (
        ANN_RETRACT_MOD,
        IVF_K,
        IVF_NPROBE,
        N_QUERIES,
        TOP_K,
    )

    out = REG["ann_ivf_delete_serve"].fn(spark, sf_dir)
    rows = out.collect()
    # (a) no tombstoned id is ever served
    assert all(
        not (r.neighbor_id % ANN_RETRACT_MOD == 3 and r.neighbor_id >= N_QUERIES)
        for r in rows
    )
    # (b) deletion only PROMOTES retained neighbors: every retained member
    # of the undeleted index's top-k must still be served
    keep = _topk_sets(out)
    base = REG["ann_ivf_persisted"].fn(spark, sf_dir)
    for r in base.collect():
        if r.neighbor_id % ANN_RETRACT_MOD == 3 and r.neighbor_id >= N_QUERIES:
            continue
        assert r.neighbor_id in keep.get(r.query_id, set()), (r.query_id, r.neighbor_id)
    # (c) recall floor vs exact-over-RETAINED corpus
    exact = {}
    for r in REG["cosine_topk_exact"].fn(spark, sf_dir).collect():
        if r.neighbor_id % ANN_RETRACT_MOD == 3 and r.neighbor_id >= N_QUERIES:
            continue  # conservative: drop deleted ids, keep the shorter list
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(keep.get(q, set()) & nbrs) for q, nbrs in exact.items())
    denom = sum(min(TOP_K, len(nbrs)) for nbrs in exact.values())
    recall = hits / denom
    assert recall >= 0.5 * IVF_NPROBE / IVF_K, f"post-delete recall {recall:.2f}"


def test_compact_tombstones_equals_overlay_serve(spark, sf_dir):
    """Compaction changes the LAYOUT, never the ANSWER: serving the
    compacted store (tombstones folded away, no overlay) must equal
    `ann_ivf_delete_serve` (deletion-vector overlay on the uncompacted
    store), row for row. The in-op gates (untouched cells byte-stable,
    zero dead rows, exact survivor count) raise on violation."""
    compact = sorted(
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rnk)
        for r in REG["ann_ivf_compact_tombstones"].fn(spark, sf_dir).collect()
    )
    overlay = sorted(
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rnk)
        for r in REG["ann_ivf_delete_serve"].fn(spark, sf_dir).collect()
    )
    assert compact == overlay
    assert compact  # non-vacuous


def test_nd_compact_tombstones_equals_overlay_probe(spark, sf_dir):
    """Same contract as the ANN pair, on the band store: the
    post-compaction probe (no overlay) must equal the deletion-vector
    overlay probe row-for-row — and both carry the SAME SQL oracle, so
    the parity sweeps hash-check each independently."""
    compact = sorted(
        (r.doc_id, r.n_band_candidates)
        for r in REG["near_dup_compact_tombstones"].fn(spark, sf_dir).collect()
    )
    overlay = sorted(
        (r.doc_id, r.n_band_candidates)
        for r in REG["near_dup_retract_reprobe"].fn(spark, sf_dir).collect()
    )
    assert compact == overlay
    assert compact  # non-vacuous


def test_append_pq_codes_small_file_bound(spark, sf_dir, pq_history_store):
    """One append lands a bounded handful of files (append_band_index's
    small-file rule), not one per shuffle partition."""
    import glob

    root, _batch = pq_history_store
    files = glob.glob(os.path.join(root, "codes", "*.parquet"))
    # history build + one append from the bit-identity test above; each
    # bounded by min(shuffle.partitions, 8)
    assert len(files) <= 16, len(files)
