"""Hybrid retrieval ([EXT]): fuse lexical (BM25) and dense (embedding
cosine) rankings with Reciprocal Rank Fusion — the standard two-tower
corpus-audit/RAG retrieval shape a training-data pipeline runs to pull
targeted slices out of a 100 TB corpus.

Reference parity: composes the corpus scan + Word2Vec-table lookup the
course builds separately (`Word2VecTransformingIterator.java:123` for the
embedding side, the chapter-2 token pipeline for the lexical side) into
one retrieval query; neither ranking exists in the reference as a fused
op, so this is [EXT] surface.

Scale shape: each tower ends in a global top-K — BM25 is one scan with a
broadcast 1-row stats join and `TakeOrderedAndProject`; the dense tower
broadcasts the 1-row query vector and ends in `TakeOrderedAndProject`.
The fusion join then runs over two K-row lists (K=20), so it broadcasts
regardless of corpus size: total cost is two corpus scans, zero wide
shuffles, and the fused output is O(K).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.arrays import as_double, cosine
from ..functions.text import _bm25_duck, bm25_topk
from ..registry import register
from ..sources.catalog import load_table

RRF_K = 60  # standard reciprocal-rank-fusion damping constant
TOWER_TOPK = 20  # per-tower candidate list length
QUERY_VEC_ID = 0  # the dense query = this row's embedding


def _rrf_duck() -> str:
    return f"""
        WITH lex AS (
          SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS lex_rank
          FROM ({_bm25_duck()})
        ),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
        dense_scored AS (
          SELECT e.vec_id AS doc_id,
                 list_dot_product(q.qv, e.v)
                   / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS cos
          FROM e CROSS JOIN q WHERE e.vec_id != {QUERY_VEC_ID}
        ),
        dense AS (
          SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS dense_rank_
          FROM dense_scored ORDER BY cos DESC, doc_id ASC LIMIT {TOWER_TOPK}
        )
        SELECT coalesce(lex.doc_id, dense.doc_id) AS doc_id,
               CAST(lex.lex_rank AS BIGINT) AS lex_rank,
               CAST(dense.dense_rank_ AS BIGINT) AS dense_rank,
               round(coalesce(1.0 / ({RRF_K} + lex.lex_rank), 0.0)
                     + coalesce(1.0 / ({RRF_K} + dense.dense_rank_), 0.0), 6) + 0.0 AS rrf_score
        FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
    """


@register(
    "hybrid_retrieval_rrf",
    oracle=_rrf_duck(),
    doc="Reciprocal Rank Fusion of BM25 lexical top-k and embedding-cosine dense top-k.",
    tags=("retrieval", "similarity", "text", "ext", "scale"),
)
def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF over the two candidate lists: score(d) = Σ 1/(60 + rank_tower(d)).

    Both towers are already global-top-K, so the rank windows and the
    fusion join operate on ≤K rows — the single-partition window is a
    deliberate post-top-K step, not a scale hazard.
    """
    lex = bm25_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()))
        .cast("long")
        .alias("lex_rank"),
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    qv = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    dense = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select(F.col("vec_id").alias("doc_id"), cosine(F.col("qv"), F.col("v")).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("doc_id").asc())
        .limit(TOWER_TOPK)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("cos").desc(), F.col("doc_id").asc()))
            .cast("long")
            .alias("dense_rank"),
        )
    )

    fused = lex.join(dense, "doc_id", "full_outer")
    rrf = F.round(
        F.coalesce(1.0 / (RRF_K + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (RRF_K + F.col("dense_rank")), F.lit(0.0)),
        6,
    )
    return fused.select("doc_id", "lex_rank", "dense_rank", rrf.alias("rrf_score"))
