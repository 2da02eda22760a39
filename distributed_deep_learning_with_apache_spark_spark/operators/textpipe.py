"""The chapter-2 text pipeline end-to-end (SURVEY §3.2, M2): tokenize (T1/T2)
→ vocabulary-membership semi-join (P4) → truncation (P5) → embedding lookup
join (J1) → averaged document vectors.

Reference parity: `Word2VecTransformingIterator.java:70-145` runs this as a
per-batch imperative loop (tokenize :95, vocab filter :97-99, truncate
:104-105, lookup join :123, tensor pack :109-141). Here it is ONE declarative
Catalyst plan; the rank-3 tensor + masks disappear because ragged arrays
carry per-row length (SURVEY §7.4.6).

The embedding table stands in for the GoogleNews Word2Vec table (S12);
tokens map to vec_ids via integer arithmetic (engine-portable, no
hash-function parity issues): vec_id = (ascii(first_char)·31 + len·7) mod N.

Scale posture: the vocab is built with one hash agg (map-side combined);
both joins are broadcasts (vocab and embedding tables are dimension-sized —
J1's contract per SURVEY §7.4.4, sort-merge + salting documented as the
fallback when the vocabulary outgrows ~1 GB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import DUCK_TOKENS, tokens
from ..registry import register
from ..sources.catalog import load_table

MIN_TOKEN_FREQ = 50  # corpus-frequency floor for vocabulary membership
TRUNCATE_AT = 64     # P5 cap (reference uses 256 on longer docs)
N_VECS = 500         # embeddings table is fixed-size at every SF

_DUCK_POSTING = f"""
          SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
          FROM (SELECT doc_id, {DUCK_TOKENS.format(col='text')} AS toks FROM documents)
"""


def _widen_scan(d: DataFrame, spark: SparkSession, data_path: str | None = None) -> DataFrame:
    """Repartition raw documents BEFORE tokenize only when the scan is
    narrower than the session's parallelism.

    Locally the fixture is one split per file, so the expensive tokenize
    projection would run single-task — a few-MB text shuffle buys
    full-width parallelism (measured at sf0.1: 1.0 s vs 1.5 s without, vs
    1.7 s tokenizing single-task then exchanging token arrays).  At 100 TB
    a documents table scans as thousands of splits already, and this gate
    makes the exchange vanish instead of re-shuffling the full text
    payload.  Split-count estimate is a driver-side stat of the parquet
    bytes against maxPartitionBytes (no Spark job, no plan compilation).
    """
    import os

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if data_path is not None:
        if os.path.isfile(data_path):
            nbytes = os.path.getsize(data_path)
        elif os.path.isdir(data_path):
            nbytes = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(data_path)
                for f in fs
            )
        else:
            nbytes = 0
        max_split = 128 * 1024 * 1024  # spark.sql.files.maxPartitionBytes default
        if nbytes >= n_part * max_split:  # scan is already wide enough
            return d
    return d.repartition(n_part)


def _posting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tok, pos): order-preserving token posting list."""
    import os

    d = _widen_scan(
        load_table(spark, sf_dir, "documents"),
        spark,
        os.path.join(sf_dir, "documents.parquet"),
    )
    return (
        d.select("doc_id", F.posexplode(tokens("text")).alias("pos0", "tok"))
        .select("doc_id", "tok", (F.col("pos0") + 1).alias("pos"))
    )


def _vocab(posting: DataFrame) -> DataFrame:
    """P4's vocabulary: tokens meeting the corpus-frequency floor."""
    return (
        posting.groupBy("tok").agg(F.count(F.lit(1)).alias("freq")).filter(
            F.col("freq") >= MIN_TOKEN_FREQ
        )
    )


# ---------------------------------------------------------------------------
# P4 + P5: vocab semi-join filter + order-preserving truncation
# ---------------------------------------------------------------------------
@register(
    "vocab_filter_truncate",
    oracle=f"""
        WITH posting AS ({_DUCK_POSTING}),
        vocab AS (
          SELECT tok FROM posting GROUP BY tok HAVING count(*) >= {MIN_TOKEN_FREQ}
        ),
        kept AS (
          SELECT p.doc_id, p.tok, p.pos FROM posting p JOIN vocab v ON p.tok = v.tok
        ),
        seqs AS (
          SELECT doc_id, list(tok ORDER BY pos ASC) AS kept_tokens FROM kept GROUP BY doc_id
        )
        SELECT doc_id,
               len(kept_tokens) AS n_in_vocab,
               len(list_slice(kept_tokens, 1, {TRUNCATE_AT})) AS n_kept,
               array_to_string(list_slice(kept_tokens, 1, 8), ' ') AS head_tokens
        FROM seqs
    """,
    tags=("textpipe",),
)
def vocab_filter_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+P5: drop out-of-vocabulary tokens (semi-join against the frequency
    vocabulary), keep original order, cap at TRUNCATE_AT."""
    posting = _posting(spark, sf_dir)
    vocab = _vocab(posting)
    kept = posting.join(F.broadcast(vocab.select("tok")), "tok")
    seqs = kept.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "tok"))).alias("ordered")
    ).select("doc_id", F.col("ordered.tok").alias("kept_tokens"))
    return seqs.select(
        "doc_id",
        F.size("kept_tokens").alias("n_in_vocab"),
        F.size(F.slice("kept_tokens", 1, TRUNCATE_AT)).alias("n_kept"),
        F.array_join(F.slice("kept_tokens", 1, 8), " ").alias("head_tokens"),
    )


# ---------------------------------------------------------------------------
# J1 + averaging: embedding lookup join → mean document vector
# ---------------------------------------------------------------------------
_TOK2VEC_DUCK = f"(ascii(substr(tok, 1, 1)) * 31 + length(tok) * 7) % {N_VECS}"


@register(
    "doc_embedding_avg",
    oracle=f"""
        WITH posting AS ({_DUCK_POSTING}),
        vocab AS (
          SELECT tok FROM posting GROUP BY tok HAVING count(*) >= {MIN_TOKEN_FREQ}
        ),
        kept AS (
          SELECT p.doc_id, p.tok, p.pos,
                 row_number() OVER (PARTITION BY p.doc_id ORDER BY p.pos ASC) AS rn
          FROM posting p JOIN vocab v ON p.tok = v.tok
        ),
        looked_up AS (
          SELECT k.doc_id, k.rn, e.embedding
          FROM (SELECT *, {_TOK2VEC_DUCK} AS vec_id FROM kept WHERE rn <= {TRUNCATE_AT}) k
          JOIN embeddings e ON e.vec_id = k.vec_id
        ),
        dims AS (
          SELECT doc_id, rn, generate_subscripts(embedding, 1) AS dim,
                 unnest(embedding::DOUBLE[]) AS v
          FROM looked_up
        ),
        avgs AS (
          -- sum in token order (ORDER BY rn) so the floating-point fold is
          -- bit-identical to the Spark side's ordered aggregate fold
          SELECT doc_id, dim, sum(v ORDER BY rn ASC) / count(*) AS dim_avg,
                 count(*) AS n
          FROM dims GROUP BY doc_id, dim
        )
        SELECT doc_id,
               -- serialized micro-units (not a LIST column): the driver's
               -- pandas hasher can't hash list cells; the ordered FP fold on
               -- both sides makes the raw doubles bit-identical, so the
               -- scaled-int encoding is engine-portable
               array_to_string(list(CAST(round(dim_avg * 1000000) AS BIGINT)
                                    ORDER BY dim ASC), ',') AS doc_vector,
               min(n) AS n_embedded
        FROM avgs GROUP BY doc_id
    """,
    tags=("textpipe", "join"),
    bench=True,
)
def doc_embedding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full chapter-2 plan: tokenize → vocab semi-join → truncate →
    embedding broadcast-join → per-dimension mean → document vector.

    One Catalyst plan; the only shuffles are the vocab agg and the final
    per-(doc, dim) average — the embedding lookup itself is a broadcast
    hash join, exactly J1's contract.
    """
    # Tokenize ONCE: the vocab branch and the kept-arrays branch both need
    # the token arrays, and without a barrier each re-derived the full
    # scan→tokenize pipeline (2 FileScans of documents in the executed
    # plan — r12 optimization pass). The per-invocation localCheckpoint
    # materializes the token arrays behind the widened scan; both
    # branches read it (guide-§8 proxy-table shape: tokenize the corpus
    # once, decide vocabulary and lookups from the token table).
    import os

    d = _widen_scan(
        load_table(spark, sf_dir, "documents"),
        spark,
        os.path.join(sf_dir, "documents.parquet"),
    )
    toks_df = d.select("doc_id", tokens("text").alias("toks")).localCheckpoint(
        eager=True
    )
    posting = toks_df.select("doc_id", F.explode("toks").alias("tok"))
    # Vocab-fits-in-executor-memory fast path: collapse the vocabulary into
    # one array row and broadcast it, then filter token arrays in place —
    # no 1M-row semi-join + per-doc window sort (measured ~2× faster at 5k
    # docs). vocab_filter_truncate above keeps the general semi-join+window
    # plan for vocabularies too large to broadcast (SURVEY §7.4.4).
    vocab_arr = _vocab(posting).agg(F.collect_set("tok").alias("vocab"))
    kept_arrays = (
        toks_df
        .crossJoin(F.broadcast(vocab_arr))
        .select(
            "doc_id",
            F.slice(
                F.filter("toks", lambda t: F.array_contains("vocab", t)), 1, TRUNCATE_AT
            ).alias("kept"),
        )
        .filter(F.size("kept") > 0)
    )
    kept = kept_arrays.select(
        "doc_id", F.posexplode("kept").alias("rn0", "tok")
    ).select(
        "doc_id",
        (F.col("rn0") + 1).alias("rn"),
        (F.ascii(F.substring("tok", 1, 1)) * 31 + F.length("tok") * 7).__mod__(N_VECS).alias(
            "vec_id"
        ),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    looked_up = kept.join(F.broadcast(emb), "vec_id").select(
        "doc_id", "rn", F.col("embedding").cast("array<double>").alias("v")
    )
    # Elementwise mean WITHOUT exploding dims into the shuffle: collect the
    # ≤TRUNCATE_AT vectors per doc (ordered by token position for run-to-run
    # FP determinism) and fold with zip_with — the shuffle carries one row
    # per (doc, token) instead of one per (doc, token, dim): 64× less.
    grouped = looked_up.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("rn", "v"))).alias("ordered")
    )
    vs = F.col("ordered.v")
    dim = F.size(F.element_at(vs, 1))
    sum_vec = F.aggregate(
        vs,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
    )
    n = F.size(vs)
    return grouped.select(
        "doc_id",
        F.array_join(
            F.transform(sum_vec, lambda s: F.round((s / n) * 1e6).cast("long").cast("string")),
            ",",
        ).alias("doc_vector"),
        n.alias("n_embedded"),
    )
