"""Deduplication operators for LLM-data pipelines ([EXT], SURVEY §2.13).

Four tiers, all deterministic and (except where noted) oracle-checked:

- exact: canonical-fingerprint groupBy (hash of sorted distinct tokens)
- n-gram Jaccard: 3-token shingles → shared-shingle candidate join → exact
  Jaccard filter (the classic inverted-index near-dup join)
- MinHash + LSH: deterministic md5-based minhash signatures → banded
  bucket join → candidate pairs (verified with exact Jaccard)
- SimHash: 16-bit md5-derived simhash per document (bit-vote form)

Scale posture: every join here is an equi-join on a derived key (shingle,
band value), so Spark shuffles on that key — no cross join anywhere. The
shared-shingle join self-prunes: only docs sharing a shingle meet. At
100 TB the band join is the only one whose fan-out needs watching; with
b bands it produces ≤ b candidates per true pair and the distinct() after
it collapses them before the (expensive) exact-Jaccard verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import DUCK_TOKENS, tokens
from ..registry import register
from ..sources.catalog import load_table
from .textpipe import _widen_scan

# --- shared shingle builders (Spark + DuckDB must stay in lockstep) --------

DUCK_SHINGLES = (
    "list_distinct([array_to_string(list_slice({t}, i, i + 2), ' ') "
    "for i in generate_series(1, greatest(len({t}) - 2, 0))])"
).format(t=DUCK_TOKENS.format(col="text"))


def shingles(col="text", n: int = 3):
    """Distinct n-token shingles (word n-grams) of the tokenized text.

    Built from n shifted slices folded with zip_with — O(len) per row.
    (An element_at(tok, i)-per-index formulation re-evaluates the tokenize
    expression on every access — O(len²) per row — because Catalyst inlines
    the unaliased expression into each lambda call; measured 8× slower on
    the 5k-doc corpus.)
    """
    tok = tokens(col)
    length = F.greatest(F.size(tok) - (n - 1), F.lit(0))
    gram = F.slice(tok, 1, length)
    for k in range(1, n):
        gram = F.zip_with(gram, F.slice(tok, k + 1, length), lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(gram)


# ---------------------------------------------------------------------------
# Exact dedup by canonical fingerprint
# ---------------------------------------------------------------------------
@register(
    "dedup_exact_groups",
    oracle=f"""
        WITH fp AS (
          SELECT doc_id,
                 md5(coalesce(array_to_string(list_sort(list_distinct({DUCK_TOKENS.format(col='text')})), ' '), '')) AS fingerprint
          FROM documents
        )
        SELECT fingerprint, min(doc_id) AS keeper_doc_id, count(*) AS group_size
        FROM fp GROUP BY fingerprint HAVING count(*) > 1
    """,
    tags=("dedup", "ext"),
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the canonical fingerprint; emit only
    groups that actually collapse (keeper = min doc_id)."""
    d = load_table(spark, sf_dir, "documents")
    canon = F.array_join(F.array_sort(F.array_distinct(tokens("text"))), " ")
    return (
        d.select("doc_id", F.md5(canon).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") > 1)
    )


@register(
    "dedup_exact_survivors",
    oracle="""
        SELECT doc_id FROM (
          SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
          FROM documents
        ) WHERE rn = 1
    """,
    tags=("dedup", "ext"),
)
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-text dedup keeping the lowest doc_id per hash (row_number==1
    — the deterministic form of dropDuplicates)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy(F.col("doc_id").asc())
    return (
        d.select("doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("doc_id")
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup join (inverted shingle index)
# ---------------------------------------------------------------------------
@register(
    "near_dup_jaccard",
    oracle=f"""
        WITH sh AS (
          SELECT doc_id, {DUCK_SHINGLES} AS sh FROM documents
        ),
        posting AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        cand AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
          FROM posting a JOIN posting b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               round(c.shared * 1.0 / (len(sa.sh) + len(sb.sh) - c.shared), 6) AS jaccard
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b
        WHERE c.shared * 1.0 / (len(sa.sh) + len(sb.sh) - c.shared) >= 0.1
    """,
    tags=("dedup", "ext"),
)
def near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection: 3-gram shingle posting-list self-join → exact
    Jaccard ≥ 0.1 pairs.

    The candidate join is an equi-join on shingle (shuffle on shingle),
    never a cross join: only documents sharing ≥1 shingle are compared.
    At 100 TB add a stop-shingle filter (drop shingles with huge posting
    lists) — semantics-preserving for any threshold ≥ shared/union bound.

    The shingle table is built ONCE behind a widened scan and an eager
    per-invocation localCheckpoint (r12 optimization): its three
    consumers (posting self-join sides + the size lookup) otherwise each
    re-derived the full scan→shingles pipeline — and the one-split local
    scan ran it single-task. Same barrier pattern as
    near_dup_minhash_verified; content identical, oracle unchanged.

    The checkpointed table carries xxhash64 longs, not shingle strings
    (r12 optimization session 3, guide §2.3 — narrower types): the
    posting self-join shuffles an 8-byte long per posting instead of a
    ~25-byte word-trigram string, and the within-bucket equi-compare is
    a long compare. `shingles()` is array_distinct, so shared counts and
    sizes — hence every Jaccard value — match the string-set semantics
    EXCEPT under a 64-bit hash collision (the same argument as
    near_dup_minhash_verified's `hx` verify). Collision bound: at the
    100 TB target (~1e11-1e12 distinct shingles) birthday collisions are
    expected in the low thousands, each able to merge two shingles'
    posting lists or perturb one pair's shared count — a standard,
    accepted trade (see SCALE.md); at test scale the DuckDB string-side
    oracle re-proves exact equality every drive.
    """
    import os

    d = _widen_scan(
        load_table(spark, sf_dir, "documents"),
        spark,
        os.path.join(sf_dir, "documents.parquet"),
    )
    sh = d.select(
        "doc_id",
        F.transform(shingles(), lambda s: F.xxhash64(s)).alias("hx"),
    ).localCheckpoint(eager=True)
    posting = sh.select("doc_id", F.explode("hx").alias("shingle"))
    a = posting.alias("a")
    b = posting.alias("b")
    cand = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sizes = sh.select("doc_id", F.size("hx").alias("n_sh"))
    jacc = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (
        cand.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
        .filter(jacc >= 0.1)
        .select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard with stop-shingle filtering (the 100 TB path)
# ---------------------------------------------------------------------------
STOP_DF = 50  # shingles appearing in more than this many docs carry no signal


@register(
    "near_dup_jaccard_stopfiltered",
    oracle=f"""
        WITH sh AS (
          SELECT doc_id, {DUCK_SHINGLES} AS sh FROM documents
        ),
        posting AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        rare AS (
          SELECT shingle FROM posting GROUP BY shingle HAVING count(*) <= {STOP_DF}
        ),
        rp AS (SELECT p.doc_id, p.shingle FROM posting p JOIN rare r ON p.shingle = r.shingle),
        cand AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM rp a JOIN rp b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               round(len(list_intersect(sa.sh, sb.sh)) * 1.0
                     / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) AS jaccard
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b
        WHERE len(list_intersect(sa.sh, sb.sh)) * 1.0
              / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5
    """,
    tags=("dedup", "ext", "scale"),
)
def near_dup_jaccard_stopfiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup Jaccard with a stop-shingle filter: shingles whose posting
    list exceeds STOP_DF docs are dropped from CANDIDATE GENERATION (they
    are boilerplate, not signal); the Jaccard itself is still computed on
    the full shingle sets.

    This is the plan that survives 100×: candidate fan-out is bounded by
    STOP_DF per shingle, so the shuffle is O(n_shingles · STOP_DF²) instead
    of O(n_docs²). Trade-off (documented, standard practice): a pair whose
    every shared shingle is boilerplate is missed — at threshold 0.5 such
    pairs are overwhelmingly template collisions, exactly what dedup should
    not key on.

    Everything downstream of the shingle build runs on xxhash64 longs
    (r12 optimization session 3, guide §2.3): the posting df-count, the
    rare filter, the candidate self-join AND the verify's
    array_intersect — the verify previously intersected raw ~25-byte
    string arrays over every candidate pair, the measured hot spot of
    the whole op. `shingles()` is array_distinct, so df counts, shared
    counts, set sizes and intersections are identical on hashes EXCEPT
    under a 64-bit collision (near_dup_minhash_verified's standing `hx`
    argument, now with the honest bound): at ~1e11-1e12 distinct
    shingles a few thousand birthday collisions are expected, and a
    collision here is collision-SENSITIVE in a way the plain-jaccard op
    is not — two merged shingles' combined df can cross STOP_DF and
    silently drop a rare shingle from candidate generation. Standard,
    accepted approximation at scale (see SCALE.md); the DuckDB
    string-side oracle re-proves exact equality at test scale every
    drive.
    """
    import os

    # One widened scan + per-invocation checkpoint for the shingle table
    # (three consumers; same barrier rationale as near_dup_jaccard).
    d = _widen_scan(
        load_table(spark, sf_dir, "documents"),
        spark,
        os.path.join(sf_dir, "documents.parquet"),
    )
    sh = d.select(
        "doc_id",
        F.transform(shingles(), lambda s: F.xxhash64(s)).alias("hx"),
    ).localCheckpoint(eager=True)
    posting = sh.select("doc_id", F.explode("hx").alias("shingle"))
    rare = posting.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= STOP_DF
    )
    rp = posting.join(rare.select("shingle"), "shingle")
    a = rp.alias("a")
    b = rp.alias("b")
    cand = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("hx").alias("sha"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("hx").alias("shb"))
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb")))
    jacc = inter / (F.size("sha") + F.size("shb") - inter)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jacc >= 0.5)
        .select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding (deterministic md5 hash family)
# ---------------------------------------------------------------------------
N_HASHES = 8
N_BANDS = 4  # rows-per-band = 2


def _band_signature(sh: DataFrame) -> DataFrame:
    """(doc_id, hs) → (doc_id, band_0..band_3): all 8 minhashes in ONE
    fold over the digest array via an F.aggregate struct accumulator,
    instead of 8 array_min(transform(...)) passes each materializing a
    fresh array per row. Wall-clock-neutral at sf0.1 (the stage is
    shingle-build-bound there) but 8× fewer transient array allocations
    per row, which is what matters under executor memory pressure at
    scale. Values are bit-identical to the per-k form — same min over
    the same substrings — so _duck_minhash stays the oracle."""
    init = F.struct(*[F.lit("￿").alias(f"m{k}") for k in range(N_HASHES)])
    return sh.select(
        "doc_id",
        F.aggregate(
            "hs",
            init,
            lambda acc, h: F.struct(
                *[
                    F.least(acc[f"m{k}"], F.substring(h, 2 * k + 1, 16)).alias(f"m{k}")
                    for k in range(N_HASHES)
                ]
            ),
        ).alias("m"),
    ).select(
        "doc_id",
        *[
            F.md5(F.concat(F.col("m")[f"m{2 * b}"], F.col("m")[f"m{2 * b + 1}"])).alias(f"band_{b}")
            for b in range(N_BANDS)
        ],
    )


# One md5 per shingle; the k-th hash is the 16-hex-char window at offset
# 2k+1 of that digest (k ≤ 8 windows fit the 32-char digest). Imperfectly
# independent but ample for LSH banding, and it cuts md5 invocations 8×
# (measured: the md5s, not the joins, dominate signature cost).
def _duck_minhash(k: int) -> str:
    return (
        f"list_aggregate(list_transform({DUCK_SHINGLES}, s -> substr(md5(s), {2 * k + 1}, 16)), 'min')"
    )


_DUCK_BANDS = ", ".join(
    f"md5({_duck_minhash(2 * b)} || {_duck_minhash(2 * b + 1)}) AS band_{b}" for b in range(N_BANDS)
)

@register(
    "minhash_lsh_candidates",
    oracle=f"""
        WITH sig AS (
          SELECT doc_id, {_DUCK_BANDS}
          FROM documents
          WHERE len({DUCK_SHINGLES}) > 0
        ),
        bands AS (
          SELECT doc_id, band_id, band_val FROM sig
          UNPIVOT (band_val FOR band_id IN (band_0, band_1, band_2, band_3))
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    """,
    tags=("dedup", "ext", "lsh"),
)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8 hashes)+LSH(4 bands × 2 rows): shingle → minhash → band →
    bucket-join. Hash family is md5('k:'||shingle) (deterministic, engine-
    portable); signature element = lexicographic min; band key = md5 of its
    2 signature elements.

    Scale: the band join shuffles on (band_id, band_val) — bucket sizes are
    the collision groups, so work is proportional to true near-dup density,
    not n².
    """
    d = load_table(spark, sf_dir, "documents")
    # Widened scan + eager per-invocation localCheckpoint around the
    # shingle build (same rationale as near_dup_minhash_verified): the
    # widen parallelizes the expensive projection beyond the scan's
    # single split; the checkpoint is the materialization barrier — a
    # repartition barrier alone stopped expression re-inlining but still
    # let the two band-join sides re-derive the build (broadcast sides
    # never reuse a shuffle exchange — r12 optimization pass).
    sh = (
        _widen_scan(d, spark, __import__("os").path.join(sf_dir, "documents.parquet"))
        .select("doc_id", shingles().alias("sh"))
        .filter(F.size("sh") > 0)
        .select("doc_id", F.transform(F.col("sh"), F.md5).alias("hs"))
        .localCheckpoint(eager=True)
    )

    sig = _band_signature(sh)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.create_map(
                *[x for b in range(N_BANDS) for x in (F.lit(f"band_{b}"), F.col(f"band_{b}"))]
            )
        ).alias("band_id", "band_val"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# MinHash candidates → exact-Jaccard verify (the production dedup pipeline)
# ---------------------------------------------------------------------------
@register(
    "near_dup_minhash_verified",
    oracle=f"""
        WITH sh AS (
          SELECT doc_id, {DUCK_SHINGLES} AS sh FROM documents
        ),
        sig AS (
          SELECT doc_id, {_DUCK_BANDS}
          FROM documents
          WHERE len({DUCK_SHINGLES}) > 0
        ),
        bands AS (
          SELECT doc_id, band_id, band_val FROM sig
          UNPIVOT (band_val FOR band_id IN (band_0, band_1, band_2, band_3))
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               round(len(list_intersect(sa.sh, sb.sh)) * 1.0
                     / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6) AS jaccard
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b
        WHERE len(list_intersect(sa.sh, sb.sh)) * 1.0
              / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5
    """,
    tags=("dedup", "ext", "scale", "lsh"),
    bench=True,
)
def near_dup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production near-dup pipeline: MinHash+LSH banding generates
    candidates (work ∝ true-duplicate density), then exact Jaccard on the
    full shingle sets verifies each candidate at threshold 0.5.

    This composition is what runs at 100 TB: no quadratic stage anywhere —
    banding shuffles on band value, verification touches only candidate
    pairs. The exhaustive `near_dup_jaccard` query is its ground-truth
    check at test scale.
    """
    d = load_table(spark, sf_dir, "documents")
    # One wide exchange BEFORE the shingle+hash projection (the documents
    # scan is one split per file, so the expensive projection would run
    # single-task — same `_widen_scan` gate as everywhere), then an EAGER
    # localCheckpoint of the hashed-signature table. Four consumers read
    # it (bands a/b, verify a/b); without a materialization barrier the
    # optimizer re-derived the full scan→shingles→md5/xxhash pipeline in
    # EVERY consumer — the r12 optimization pass measured 4 FileScans and
    # 0 ReusedExchange in the executed plan (broadcast-join sides can
    # never reuse a shuffle exchange, and per-consumer column pruning
    # splits the rest), i.e. the dominant stage ran 4×. The checkpoint is
    # per-invocation (each call rebuilds it — nothing persists across
    # runs) and is exactly the guide-§8 move: materialize the small
    # hash-proxy table once, decide candidates and verify from the proxy,
    # never recompute from the raw corpus. On a cluster the same barrier
    # is a reliable-storage checkpoint or an explicit write+read of the
    # signature table; the fault-tolerance delta is the localCheckpoint
    # contract already documented in SCALE.md for the logstar loop.
    #
    # Two hash columns from one build: `hs` (md5 — the engine-portable
    # signature family DuckDB mirrors) feeds the band signatures; `hx`
    # (xxhash64 longs, Spark-only) feeds the verify joins, whose
    # array_intersect compares 8-byte longs instead of 32-char strings and
    # whose candidate-side shuffle shrinks ~6×. The oracle is unchanged:
    # Jaccard over distinct shingles is hash-agnostic.
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sh = (
        _widen_scan(d, spark, __import__("os").path.join(sf_dir, "documents.parquet"))
        .select("doc_id", shingles().alias("sh"))
        .filter(F.size("sh") > 0)
        .select(
            "doc_id",
            F.transform(F.col("sh"), F.md5).alias("hs"),
            F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("hx"),
        )
        .localCheckpoint(eager=True)
    )

    sig = _band_signature(sh)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.create_map(
                *[x for b in range(N_BANDS) for x in (F.lit(f"band_{b}"), F.col(f"band_{b}"))]
            )
        ).alias("band_id", "band_val"),
    )
    ba = bands.alias("a")
    bb = bands.alias("b")
    cand = (
        ba.join(
            bb,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("hx").alias("sha"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("hx").alias("shb"))
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb")))
    jacc = inter / (F.size("sha") + F.size("shb") - inter)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jacc >= 0.5)
        .select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Connected components over near-dup pairs → dedup clusters
# ---------------------------------------------------------------------------
# Transitive-closure fixpoint over the jaccard >= 0.5 pair graph — shared by
# both CC implementations (label propagation and large/small-star), which
# must produce the identical (doc_id, cluster_id) labeling.
_CC_FIXPOINT_ORACLE = f"""
        WITH RECURSIVE sh AS (
          SELECT doc_id, {DUCK_SHINGLES} AS sh FROM documents
        ),
        posting AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        cand AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
          FROM posting a JOIN posting b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        ),
        pairs AS (
          SELECT c.doc_a, c.doc_b
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b
          WHERE c.shared * 1.0 / (len(sa.sh) + len(sb.sh) - c.shared) >= 0.5
        ),
        edges AS (
          SELECT doc_a AS s, doc_b AS t FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        nodes AS (SELECT DISTINCT s AS doc FROM edges),
        reach AS (
          SELECT doc, doc AS r FROM nodes
          UNION
          SELECT e.t AS doc, reach.r
          FROM reach JOIN edges e ON e.s = reach.doc
        )
        SELECT doc AS doc_id, min(r) AS cluster_id FROM reach GROUP BY doc
    """


@register(
    "dedup_clusters",
    oracle=_CC_FIXPOINT_ORACLE,
    tags=("dedup", "ext", "graph"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: connected components over the
    jaccard ≥ 0.5 pair graph; cluster id = min doc_id in the component
    (the canonical 'keeper').

    Spark side runs label propagation to a fixpoint — each iteration is
    one equi-join + min-aggregate (the standard large-graph CC pattern:
    iterations = graph diameter, every step shuffle-partitioned, nothing
    driver-side except the convergence check). The oracle computes the
    same fixpoint with a recursive CTE.
    """
    pairs = near_dup_jaccard(spark, sf_dir).filter(F.col("jaccard") >= 0.5).select(
        "doc_a", "doc_b"
    )
    edges = pairs.union(pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))).toDF(
        "s", "t"
    )
    edges = edges.persist()
    labels = edges.select(F.col("s").alias("doc")).distinct().withColumn("label", F.col("doc"))
    while True:
        neigh = (
            edges.join(labels, edges.t == labels.doc)
            .select(F.col("s").alias("doc"), "label")
        )
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("doc")
            .agg(F.min("label").alias("label"))
        )
        new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist() if hasattr(labels, "unpersist") else None
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("doc").alias("doc_id"), F.col("label").alias("cluster_id"))


# ---------------------------------------------------------------------------
# [EXT r5] Connected components in O(log n) rounds: alternating
# large-star / small-star (Kiveris et al., "Connected Components in
# MapReduce and Beyond", SoCC 2014)
# ---------------------------------------------------------------------------
_LOGSTAR_MAX_ROUNDS = 25  # ~log2 of any conceivable component size, then bug


def connected_components_logstar(pairs: DataFrame) -> tuple[DataFrame, int]:
    """Distributed connected components over an undirected pair list
    ``(doc_a, doc_b)`` using alternating large-star / small-star edge
    rewrites. Returns ``(labels, rounds)`` where labels is
    ``(doc_id, cluster_id)`` with cluster_id = min node id in the
    component.

    Why a second CC engine beside ``dedup_clusters``' label propagation:
    label propagation converges in O(graph diameter) join rounds — fine
    for near-dup blobs (diameter 2-3), catastrophic for chain-shaped
    components (a 1M-link chain = 1M shuffles). Large/small-star
    contracts paths, converging in O(log n) rounds REGARDLESS of
    diameter (tests pin a 200-node path at <= 14 rounds where label
    propagation needs 200). Each round is two self-equi-joins on node id
    plus a min-aggregate — all map-side-combinable, no cartesian, state
    bounded by the (shrinking) edge list. This is the form that survives
    100 TB pair graphs.

    Convergence detection compares the canonical edge set across rounds
    by (count, sum of crc32(u "," v)) — crc32 <= 2^32 so the sum cannot
    overflow a long at any realistic edge count, and an unchanged edge
    set ALWAYS yields equal fingerprints (set equality => fingerprint
    equality; the fixpoint is a proven invariant of the algorithm, the
    fingerprint only detects when we reached it).
    """
    # Canonical undirected edge list u > v (self-loops dropped). Each
    # round ends in an EAGER localCheckpoint: the iteration references its
    # input twice (symmetrize + join), so without lineage truncation the
    # logical plan doubles per round and Catalyst re-analysis goes
    # exponential by round ~10 — the standard iterative-Spark pitfall
    # (label propagation in `dedup_clusters` never hits it only because
    # near-dup diameters are 2-3). On a cluster you'd use
    # ``checkpoint()`` against reliable storage; locally the executor-
    # memory form is the same contract.
    e = (
        pairs.select(
            F.greatest("doc_a", "doc_b").alias("u"),
            F.least("doc_a", "doc_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if e.limit(1).count() == 0:
        empty = pairs.sparkSession.createDataFrame(
            [], "doc_id long, cluster_id long"
        )
        return empty, 0

    def _converged(prev: DataFrame, prev_n: int, nxt: DataFrame, nxt_n: int) -> bool:
        """Exact edge-set equality — NOT a fingerprint. A summed-crc32
        fingerprint can collide between two different edge sets, which
        would terminate early and emit wrong cluster labels. Both sides
        are distinct(); with equal cardinality, `nxt \\ prev == ∅` ⟺
        set equality. Cost: one anti-join per round over the shrinking
        (localCheckpointed) star forest — bounded by the edge count."""
        if prev_n != nxt_n:
            return False
        return nxt.exceptAll(prev).limit(1).count() == 0

    n_edges = e.count()
    rounds = 0
    while True:
        rounds += 1
        if rounds > _LOGSTAR_MAX_ROUNDS:
            raise RuntimeError("logstar CC failed to converge — algorithm bug")
        # --- large-star: every neighbor LARGER than u links to u's local
        # minimum m = min({u} ∪ neighbors(u)); strictly decreases the id
        # a large node points at, contracting long paths geometrically.
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.col("u")).alias("m")
        )
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # --- small-star: every edge now points big → small; attach all of
        # u's small neighbors (and u itself) to min(neighbors(u)).
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        nxt = (
            large.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .union(mins2.select(F.col("u"), F.col("m").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        nxt_n = nxt.count()
        done = _converged(e, n_edges, nxt, nxt_n)
        e, n_edges = nxt, nxt_n
        if done:
            break
    # Fixpoint is a star forest: each non-root points straight at its
    # component min. Emit root labels too (root labels itself).
    labels = (
        e.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
        .union(
            e.select(F.col("v").alias("doc_id"), F.col("v").alias("cluster_id"))
        )
        .groupBy("doc_id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    return labels, rounds


@register(
    "dedup_clusters_logstar",
    oracle=_CC_FIXPOINT_ORACLE,
    doc="Connected components over the near-dup pair graph in O(log n) large/small-star rounds — diameter-independent, unlike label propagation.",
    tags=("dedup", "ext", "graph", "scale"),
)
def dedup_clusters_logstar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dedup_clusters`' labeling computed by the O(log n)-round
    large/small-star algorithm instead of O(diameter) label propagation.
    Same pair graph (jaccard >= 0.5), same canonical labels (cluster id =
    min doc_id in the component), same oracle — the two engines must
    hash-match each other through the shared fixpoint SQL.

    At 100 TB the pair graph's diameter is unknown a priori (boilerplate
    chains produce long paths); this form bounds shuffle rounds at
    log2(max component size) — the difference between 20 rounds and
    20,000 on a chain-shaped component.
    """
    prs = near_dup_jaccard(spark, sf_dir).filter(F.col("jaccard") >= 0.5).select(
        "doc_a", "doc_b"
    )
    labels, _rounds = connected_components_logstar(prs)
    return labels


# ---------------------------------------------------------------------------
# SimHash (16-bit, md5 bit votes — engine-portable)
# ---------------------------------------------------------------------------
@register(
    "simhash_fingerprints",
    oracle=f"""
        WITH tok AS (
          SELECT doc_id, md5(t) AS h
          FROM (SELECT doc_id, unnest(list_distinct({DUCK_TOKENS.format(col='text')})) AS t FROM documents)
        ),
        bits AS (
          SELECT doc_id, b,
                 ((strpos('0123456789abcdef', substr(h, 1 + b // 4, 1)) - 1) >> (3 - (b % 4))) & 1 AS bit
          FROM tok, (SELECT unnest(generate_series(0, 15)) AS b)
        ),
        votes AS (
          SELECT doc_id, b, sum(2 * bit - 1) AS vote FROM bits GROUP BY doc_id, b
        )
        SELECT doc_id,
               -- CAST: DuckDB integer sum() yields HUGEINT, which the
               -- driver's pandas-based hasher normalizes via float64 and
               -- mismatches Spark's BIGINT. BIGINT on both sides.
               CAST(sum(CASE WHEN vote > 0 THEN (1 << b) ELSE 0 END) AS BIGINT) AS simhash16
        FROM votes GROUP BY doc_id
    """,
    tags=("dedup", "ext"),
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: per distinct token, md5-derived bits vote ±1 per bit
    position; fingerprint sets bit b where the vote is positive.

    (The production-scale variant would use 64-bit xxhash64 JVM-side; 16-bit
    md5-nibble form keeps the hash family bit-identical in the oracle.)
    """
    d = load_table(spark, sf_dir, "documents")
    # Repartition the raw text first: the per-token md5 + bit extraction is
    # the expensive part and would otherwise run on the scan's splits (one
    # task per file here) — the exchange spreads it across all cores.
    tok = (
        _widen_scan(d, spark, __import__("os").path.join(sf_dir, "documents.parquet"))
        .select("doc_id", F.explode(F.array_distinct(tokens("text"))).alias("t"))
        .select("doc_id", F.md5("t").alias("h"))
    )
    bits = tok.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("b"), "h"
    ).select(
        "doc_id",
        "b",
        F.expr(
            "((instr('0123456789abcdef', substring(h, 1 + CAST(b / 4 AS INT), 1)) - 1) "
            ">> (3 - b % 4)) & 1"
        ).alias("bit"),
    )
    votes = bits.groupBy("doc_id", "b").agg(F.sum(2 * F.col("bit") - 1).alias("vote"))
    return votes.groupBy("doc_id").agg(
        F.sum(F.when(F.col("vote") > 0, F.expr("shiftleft(1, b)")).otherwise(0)).alias("simhash16")
    )


# ---------------------------------------------------------------------------
# SimHash near-dup pairs: banded hamming-distance join
# ---------------------------------------------------------------------------
_DUCK_SIMHASH = f"""
        tok AS (
          SELECT doc_id, md5(t) AS h
          FROM (SELECT doc_id, unnest(list_distinct({DUCK_TOKENS.format(col='text')})) AS t FROM documents)
        ),
        bits AS (
          SELECT doc_id, b,
                 ((strpos('0123456789abcdef', substr(h, 1 + b // 4, 1)) - 1) >> (3 - (b % 4))) & 1 AS bit
          FROM tok, (SELECT unnest(generate_series(0, 15)) AS b)
        ),
        votes AS (
          SELECT doc_id, b, sum(2 * bit - 1) AS vote FROM bits GROUP BY doc_id, b
        ),
        fp AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN vote > 0 THEN (1 << b) ELSE 0 END) AS BIGINT) AS simhash16
          FROM votes GROUP BY doc_id
        )
"""

HAMMING_MAX = 3  # with 4 bands, any pair at distance ≤ 3 shares a clean band
SIMHASH16_TOP_K = 5  # per-doc nearest-neighbor cap: a 16-bit space saturates,
# so the raw pair set grows ~quadratically with duplicate density (3.85M rows
# at sf0.1); capping to the K nearest per doc_a bounds output at K·n rows.


@register(
    "simhash_near_dup_pairs",
    oracle=f"""
        WITH {_DUCK_SIMHASH},
        bands AS (
          SELECT doc_id, simhash16, bb.band_id,
                 (simhash16 >> (4 * bb.band_id)) & 15 AS band_val
          FROM fp, (SELECT unnest(generate_series(0, 3)) AS band_id) bb
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
        ),
        verified AS (
          SELECT c.doc_a, c.doc_b,
                 bit_count(xor(sa.simhash16, sb.simhash16)) AS hamming
          FROM cand c
          JOIN fp sa ON sa.doc_id = c.doc_a
          JOIN fp sb ON sb.doc_id = c.doc_b
          WHERE bit_count(xor(sa.simhash16, sb.simhash16)) <= {HAMMING_MAX}
        )
        SELECT doc_a, doc_b, hamming FROM (
          SELECT doc_a, doc_b, hamming,
                 row_number() OVER (PARTITION BY doc_a
                                    ORDER BY hamming ASC, doc_b ASC) AS rn
          FROM verified
        ) WHERE rn <= {SIMHASH16_TOP_K}
    """,
    tags=("dedup", "ext", "scale"),
)
def simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: band the 16-bit fingerprint into four 4-bit
    bands; candidates = pairs equal on ANY band (equi-join on (band_id,
    band_val)); verify hamming(simhash_a, simhash_b) ≤ 3 via bit_count(xor),
    then keep each doc's SIMHASH16_TOP_K nearest verified neighbors
    (ordered by hamming, then doc_b — deterministic).

    Recall within the cap is exact by pigeonhole: ≤ 3 differing bits
    across 4 bands forces at least one band with zero differing bits, so
    every qualifying pair appears in some bucket. The per-doc cap (r6)
    bounds the EMISSION: a 16-bit fingerprint space saturates at corpus
    scale, and the uncapped pair set grew ~quadratically with duplicate
    density (3.85M rows at sf0.1 → ~1.4M capped). This query is the
    engine-portable parity demo of the family; `simhash64_near_dup_pairs`
    (64-bit, 8 bands) is the production form whose collision density —
    hence emission — actually tracks true near-dups. Scale: shuffle keys
    are band values; the cap is a WindowGroupLimit (partial top-k on the
    map side), never a global sort.
    """
    # Per-invocation checkpoint: fp (doc_id, simhash16 — KB-sized) feeds
    # four consumers (bands a/b, verify a/b); without the barrier each
    # re-derived the full per-token md5 pipeline (r12 optimization pass).
    fp = simhash_fingerprints(spark, sf_dir).localCheckpoint(eager=True)
    bands = fp.select(
        "doc_id",
        "simhash16",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band_id"),
    ).select(
        "doc_id",
        "band_id",
        F.expr("shiftright(simhash16, 4 * band_id) & 15").alias("band_val"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash16").alias("sim_a"))
    sb = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash16").alias("sim_b"))
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(hamming <= HAMMING_MAX)
        .select("doc_a", "doc_b", hamming.alias("hamming"))
    )
    w = Window.partitionBy("doc_a").orderBy(F.col("hamming").asc(), F.col("doc_b").asc())
    return (
        verified.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SIMHASH16_TOP_K)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Survivor selection: quality-priority retention per near-dup cluster
# ---------------------------------------------------------------------------
@register(
    "dedup_cluster_survivors",
    oracle=f"""
        WITH RECURSIVE sh AS (
          SELECT doc_id, {{DUCK_SHINGLES}} AS sh FROM documents
        ),
        posting AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        cand AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
          FROM posting a JOIN posting b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        ),
        pairs AS (
          SELECT c.doc_a, c.doc_b
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b
          WHERE c.shared * 1.0 / (len(sa.sh) + len(sb.sh) - c.shared) >= 0.5
        ),
        edges AS (
          SELECT doc_a AS s, doc_b AS t FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        nodes AS (SELECT DISTINCT s AS doc FROM edges),
        reach AS (
          SELECT doc, doc AS r FROM nodes
          UNION
          SELECT e.t AS doc, reach.r
          FROM reach JOIN edges e ON e.s = reach.doc
        ),
        clusters AS (SELECT doc AS doc_id, min(r) AS cluster_id FROM reach GROUP BY doc),
        clustered AS (
          SELECT c.doc_id, c.cluster_id, length(d.text) AS n_chars,
                 row_number() OVER (
                   PARTITION BY c.cluster_id
                   ORDER BY length(d.text) DESC, c.doc_id ASC
                 ) AS rn,
                 CAST(count(*) OVER (PARTITION BY c.cluster_id) AS BIGINT) AS cluster_size
          FROM clusters c JOIN documents d USING (doc_id)
        )
        SELECT doc_id, cluster_id, cluster_size, CAST(n_chars AS BIGINT) AS n_chars
        FROM clustered WHERE rn = 1
        UNION ALL
        SELECT d.doc_id, d.doc_id AS cluster_id, 1 AS cluster_size,
               CAST(length(d.text) AS BIGINT) AS n_chars
        FROM documents d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM clusters)
    """.format(DUCK_SHINGLES=DUCK_SHINGLES),
    doc="Quality-priority survivor per near-dup cluster (keep the longest "
    "doc, tie-break lowest id) plus all singletons — the retention step "
    "after clustering.",
    tags=("dedup", "ext", "curation"),
)
def dedup_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retention step real near-dedup pipelines run after clustering
    (cf. CCNet / RefinedWeb: keep one representative per duplicate
    cluster, preferring the highest-quality member): survivor = longest
    text per cluster (tie-break lowest doc_id); singleton docs all
    survive.

    Scale: reuses dedup_clusters' label-propagation output; the survivor
    pick is one window over clusters (tiny — |clustered docs| rows) and
    the singleton side is a broadcast anti-join against the cluster
    membership list."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("n_chars")
    )
    clusters = dedup_clusters(spark, sf_dir)
    clustered = clusters.join(d, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    winners = (
        clustered.select(
            "doc_id",
            "cluster_id",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")).alias("cluster_size"),
            "n_chars",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    singletons = (
        d.join(F.broadcast(clusters.select("doc_id")), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.col("doc_id").alias("cluster_id"),
            F.lit(1).cast("long").alias("cluster_size"),
            "n_chars",
        )
    )
    return winners.unionByName(singletons)


# ---------------------------------------------------------------------------
# Substring-span dedup (suffix-array substring dedup, approximated by
# fixed-stride character shingles — Lee et al. 2022, arXiv:2107.06499)
# ---------------------------------------------------------------------------
SPAN_LEN = 40  # characters per span
SPAN_STRIDE = 20  # sampling stride (overlapping spans)
_SPAN_MAX_OFF = 4096  # static offset domain for the oracle's range() table


@register(
    "substring_span_dedup",
    oracle=f"""
        WITH g AS (
          SELECT doc_id, o, substr(text, o + 1, {SPAN_LEN}) AS gram
          FROM documents CROSS JOIN range(0, {_SPAN_MAX_OFF}, {SPAN_STRIDE}) AS t(o)
          WHERE o <= length(text) - {SPAN_LEN}
        ),
        dup AS (
          SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) > 1
        ),
        per_doc AS (
          SELECT g.doc_id,
                 count(*) AS n_spans,
                 sum(CASE WHEN dup.gram IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans
          FROM g LEFT JOIN dup ON g.gram = dup.gram
          GROUP BY g.doc_id
        )
        SELECT d.doc_id,
               coalesce(p.n_spans, 0) AS n_spans,
               coalesce(p.n_dup_spans, 0)::BIGINT AS n_dup_spans,
               round(coalesce(p.n_dup_spans, 0)
                     / greatest(coalesce(p.n_spans, 0), 1), 6) + 0.0 AS dup_span_ratio
        FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    """,
    doc="substring-level dedup signal: cross-document repeated character spans",
    tags=("dedup", "curation", "ext"),
)
def substring_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication (the suffix-array dedup of Lee et al.
    2022, 'Deduplicating Training Data Makes Language Models Better',
    approximated distributively): sample overlapping SPAN_LEN-char spans at
    SPAN_STRIDE from every document, mark a span duplicated when the same
    characters occur in ANOTHER document, and report per-document
    counts + duplicated-span ratio — the signal used to cut boilerplate
    and templated text that document-level (exact/minhash) dedup misses.

    Scale shape: span extraction is per-row array math inside the scan (no
    shuffle); the only exchange is the hash-aggregate on the span text and
    the equi-join back — both keyed on the span, so cost is linear in
    corpus size with a stop-gram cap available exactly as in
    near_dup_jaccard_stopfiltered. At 100 TB the span key shuffles as an
    8-byte xxhash64 of the text rather than the 40 raw chars (the same
    trick the minhash verify join uses); the raw-text key here keeps the
    DuckDB oracle engine-exact at test SF.
    """
    import os

    d = _widen_scan(
        load_table(spark, sf_dir, "documents"),
        spark,
        os.path.join(sf_dir, "documents.parquet"),
    )
    spans = (
        d.filter(F.length("text") >= SPAN_LEN)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.length("text") - SPAN_LEN, F.lit(SPAN_STRIDE))
            ).alias("o"),
            "text",
        )
        .select("doc_id", F.expr(f"substring(text, o + 1, {SPAN_LEN})").alias("gram"))
        # Two consumers (dup counts + per-doc join-back) — materialize the
        # span table once per invocation instead of re-extracting spans.
        .localCheckpoint(eager=True)
    )
    dup = (
        spans.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") > 1)
        .select("gram")
    )
    per_doc = (
        spans.join(dup.withColumn("is_dup", F.lit(1)), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.coalesce("is_dup", F.lit(0))).alias("n_dup_spans"),
        )
    )
    return d.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        (
            F.round(
                F.coalesce("n_dup_spans", F.lit(0))
                / F.greatest(F.coalesce("n_spans", F.lit(0)), F.lit(1)),
                6,
            )
            + 0.0
        ).alias("dup_span_ratio"),
    )


# ---------------------------------------------------------------------------
# [EXT r3] asymmetric containment: subset/quote detection
# ---------------------------------------------------------------------------
CONTAIN_T = 0.6  # doc_small is "contained" when this share of its shingles
#                  also appear in doc_big


@register(
    "near_dup_containment",
    oracle=f"""
        WITH sh AS (
          SELECT doc_id, {DUCK_SHINGLES} AS sh FROM documents
        ),
        posting AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        cand AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
          FROM posting a JOIN posting b ON a.shingle = b.shingle AND a.doc_id != b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT c.doc_a AS contained_doc, c.doc_b AS container_doc,
               CAST(len(sa.sh) AS BIGINT) AS n_sh_contained,
               round(c.shared * 1.0 / len(sa.sh), 6) AS containment
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b
        WHERE len(sa.sh) > 0 AND len(sa.sh) <= len(sb.sh)
          AND c.shared * 1.0 / len(sa.sh) >= {CONTAIN_T}
    """,
    doc="Asymmetric containment |A∩B|/|A| over shingles: finds docs substantially contained in larger docs (quotes, partial copies).",
    tags=("dedup", "ext", "scale"),
)
def near_dup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The asymmetric sibling of Jaccard dedup: a short document quoted
    inside a long one scores low Jaccard (union is dominated by the long
    doc) but high CONTAINMENT |A∩B|/|A| — the measure curation pipelines
    use to drop partial copies and quoted boilerplate while keeping the
    canonical long form.

    Only ordered (contained ≤ container by shingle count) pairs emit, so
    each relationship appears once with its direction explicit.

    This is the EXACT-RECALL BASELINE: the posting-list equi-join is
    uncapped, so a boilerplate shingle appearing in D docs contributes D²
    candidate pairs — fine at test scale, quadratic on hot shingles at
    100 TB. The production form is `near_dup_containment_stopfiltered`
    below. Note the Jaccard stop-shingle cap is NOT semantics-preserving
    here as-is: dropping hot shingles shrinks |A∩B| while |A| stays fixed,
    so capped containment under-scores and can lose true pairs near
    CONTAIN_T. The stop-filtered twin therefore excludes capped shingles
    from the |A| denominator as well (containment over the rare
    sub-vocabulary), restoring the bound.
    """
    import os

    # Widened scan + per-invocation checkpoint: four consumers (posting
    # a/b, size lookups) — same barrier rationale as near_dup_jaccard.
    # The checkpointed proxy carries xxhash64 longs, not shingle strings
    # (r12 optimization session 3, guide §2.3): shared counts and set
    # sizes — hence every containment score — are hash-agnostic over the
    # array_distinct shingle sets; the string-side oracle re-proves it.
    d = _widen_scan(
        load_table(spark, sf_dir, "documents"),
        spark,
        os.path.join(sf_dir, "documents.parquet"),
    )
    sh = d.select(
        "doc_id",
        F.transform(shingles(), lambda s: F.xxhash64(s)).alias("hx"),
    ).localCheckpoint(eager=True)
    posting = sh.select("doc_id", F.explode("hx").alias("shingle"))
    a = posting.alias("a")
    b = posting.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sizes = sh.select("doc_id", F.size("hx").alias("n_sh"))
    containment = F.col("shared") / F.col("na")
    return (
        cand.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
        .filter((F.col("na") > 0) & (F.col("na") <= F.col("nb")) & (containment >= CONTAIN_T))
        .select(
            F.col("doc_a").alias("contained_doc"),
            F.col("doc_b").alias("container_doc"),
            F.col("na").cast("long").alias("n_sh_contained"),
            F.round(containment, 6).alias("containment"),
        )
    )


@register(
    "near_dup_containment_stopfiltered",
    oracle=f"""
        WITH sh AS (
          SELECT doc_id, {DUCK_SHINGLES} AS sh FROM documents
        ),
        posting AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        rare AS (
          SELECT shingle FROM posting GROUP BY shingle HAVING count(*) <= {STOP_DF}
        ),
        rp AS (SELECT p.doc_id, p.shingle FROM posting p JOIN rare r ON p.shingle = r.shingle),
        rsz AS (SELECT doc_id, count(*) AS n_rare FROM rp GROUP BY doc_id),
        cand AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
          FROM rp a JOIN rp b ON a.shingle = b.shingle AND a.doc_id != b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT c.doc_a AS contained_doc, c.doc_b AS container_doc,
               CAST(sa.n_rare AS BIGINT) AS n_rare_contained,
               round(c.shared * 1.0 / sa.n_rare, 6) AS containment
        FROM cand c
        JOIN rsz sa ON sa.doc_id = c.doc_a
        JOIN rsz sb ON sb.doc_id = c.doc_b
        WHERE sa.n_rare <= sb.n_rare
          AND c.shared * 1.0 / sa.n_rare >= {CONTAIN_T}
    """,
    doc="Containment dedup on the rare sub-vocabulary (df <= STOP_DF): the 100 TB path — candidate fan-out DF-bounded, denominator consistently rare-only.",
    tags=("dedup", "ext", "scale"),
)
def near_dup_containment_stopfiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of containment dedup: both the candidate join AND
    the containment score operate on the RARE sub-vocabulary (shingles with
    document frequency ≤ STOP_DF).

    Why both: for Jaccard, dropping hot shingles from candidate generation
    only (scoring on full sets) is a pure-recall trade bounded by a union
    argument. For containment it is not — |A∩B| shrinks while |A| stays
    fixed, silently deflating every score. Scoring |A_rare∩B_rare|/|A_rare|
    instead is self-consistent: it measures containment of the document's
    SIGNAL content, which is what curation wants anyway (a doc whose only
    overlap is boilerplate should not be dropped as a quote).

    Scale shape: posting list is pre-filtered on df ≤ STOP_DF, so each
    shingle contributes ≤ STOP_DF² candidate pairs — the shuffle is
    O(n_shingles · STOP_DF²), never n². Direction (contained ≤ container)
    and the denominator both use the rare-set size, so the whole operator
    reads one column family and shuffles 8-byte keys.
    """
    import os

    # Widened scan + per-invocation checkpoint (the shingle subtree feeds
    # rare/rp/rsz and both self-join sides — same barrier rationale as
    # near_dup_jaccard). Proxy carries xxhash64 longs (r12 session 3,
    # guide §2.3): df counts, rare-set sizes and shared counts are
    # hash-agnostic over array_distinct shingles; oracle unchanged.
    d = _widen_scan(
        load_table(spark, sf_dir, "documents"),
        spark,
        os.path.join(sf_dir, "documents.parquet"),
    )
    sh = d.select(
        "doc_id",
        F.transform(shingles(), lambda s: F.xxhash64(s)).alias("hx"),
    ).localCheckpoint(eager=True)
    posting = sh.select("doc_id", F.explode("hx").alias("shingle"))
    rare = (
        posting.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= STOP_DF)
    )
    rp = posting.join(rare.select("shingle"), "shingle")
    rsz = rp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_rare"))
    a = rp.alias("a")
    b = rp.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    containment = F.col("shared") / F.col("na")
    return (
        cand.join(rsz.select(F.col("doc_id").alias("doc_a"), F.col("n_rare").alias("na")), "doc_a")
        .join(rsz.select(F.col("doc_id").alias("doc_b"), F.col("n_rare").alias("nb")), "doc_b")
        .filter((F.col("na") <= F.col("nb")) & (containment >= CONTAIN_T))
        .select(
            F.col("doc_a").alias("contained_doc"),
            F.col("doc_b").alias("container_doc"),
            F.col("na").cast("long").alias("n_rare_contained"),
            F.round(containment, 6).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# [EXT r4] Edit-distance-verified near-dup (the fuzzy-copy detector)
# ---------------------------------------------------------------------------
EDIT_SKEL_LEN = 256   # edit distance over the first N printable-ASCII chars
EDIT_REL_T = 0.25     # pairs with relative edit distance <= this emit
EDIT_MIN_SHARED = 2   # candidate pairs need >= 2 corroborating rare shingles

# Printable-ASCII skeleton: DuckDB's levenshtein counts BYTES while Spark's
# counts CHARACTERS, so the verified string must be byte==char. Strip
# everything outside [space, ~] on BOTH engines, then truncate.
_DUCK_SKEL = f"substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, {EDIT_SKEL_LEN})"


@register(
    "near_dup_edit_distance",
    oracle=f"""
        WITH sh AS (
          SELECT doc_id, {DUCK_SHINGLES} AS sh, {_DUCK_SKEL} AS skel FROM documents
        ),
        posting AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        rare AS (
          SELECT shingle FROM posting GROUP BY shingle HAVING count(*) <= {STOP_DF}
        ),
        rp AS (SELECT p.doc_id, p.shingle FROM posting p JOIN rare r ON p.shingle = r.shingle),
        cand AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM rp a JOIN rp b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
          HAVING count(*) >= {EDIT_MIN_SHARED}
        ),
        verified AS (
          SELECT c.doc_a, c.doc_b,
                 levenshtein(sa.skel, sb.skel) AS edit_distance,
                 greatest(len(sa.skel), len(sb.skel), 1) AS denom
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b
        )
        SELECT doc_a, doc_b, CAST(edit_distance AS BIGINT) AS edit_distance,
               round(edit_distance * 1.0 / denom, 6) AS rel_edit
        FROM verified
        WHERE edit_distance * 1.0 / denom <= {EDIT_REL_T}
    """,
    doc="Shingle-banded candidates verified by relative Levenshtein distance over an ASCII skeleton — the fuzzy-copy detector (catches edits Jaccard misses).",
    tags=("dedup", "ext", "scale"),
)
def near_dup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup verification by EDIT DISTANCE: shingle candidates (rare
    postings only, df ≤ STOP_DF — same DF-bounded generation as the
    stop-filtered Jaccard), then Levenshtein over a bounded skeleton —
    first EDIT_SKEL_LEN printable-ASCII chars — normalized by the longer
    skeleton. Catches in-place token edits (typo farms, template fills)
    whose shingle overlap stays high enough to band but whose set-based
    Jaccard under-measures character-level similarity.

    Candidate policy: pairs must share ≥ EDIT_MIN_SHARED rare shingles
    (oracle-mirrored HAVING). One shared 3-gram is noise, not evidence —
    at sf0.1 the 1-shingle policy produced 1.13M candidates of which the
    ≥2 policy keeps 112k with the SAME 256 verified pairs (measured).
    The documented recall trade is the same one candidate generation
    already makes: a pair whose edits are sprinkled densely enough to
    leave <2 intact shared shingles was never reachable by shingle
    banding in the first place.

    Scale shape: candidate fan-out is DF-bounded (≤ STOP_DF² per shingle)
    and corroboration-gated; the verify is the 3-arg banded Levenshtein —
    O(EDIT_SKEL_LEN · max_lev) per pair, early-exiting past the
    threshold — behind a free length-difference gate (lev ≥ |la−lb|,
    so wide-gap pairs drop before any DP runs). Measured at sf0.1:
    102 s (naive) → 6.6 s, bit-identical output. The skeleton cap is the
    production trick: unbounded Levenshtein on 100 KB documents is
    quadratic in document length, so fuzzy-copy verification always
    bounds the compared span.

    Engine portability: Spark levenshtein counts characters, DuckDB bytes;
    the printable-ASCII projection makes byte == char on both.

    Parallelism discipline (r12 optimization, guide §2.5-2.6): every
    CPU-heavy stage here is tiny in BYTES (a 5k-doc corpus shuffles a few
    MB) but expensive per ROW, so (a) the one-split documents scan must be
    widened before the shingle projection (same `_widen_scan` gate as the
    minhash pipeline — it vanishes on wide scans), and (b) the self-join
    and both verify joins ride explicit `repartition(n, key)` exchanges:
    AQE's byte-based coalescing would otherwise collapse them to 1-2
    tasks (measured: a 35 s single-task self-join+agg stage at sf0.1 —
    reading 1 MB, writing 11 MB — and the banded-Levenshtein stage, ~3.7G
    DP cells, serialized the same way). User-numbered repartitions are
    exempt from AQE coalescing, so the expensive stages keep the
    session's full width while every byte-bound stage stays adaptive.
    The keyed repartition doubles as the join distribution (no extra
    exchange), and partition count stays conf-derived — on a cluster the
    same code widens to the cluster's shuffle width.
    """
    import os

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = _widen_scan(
        load_table(spark, sf_dir, "documents"),
        spark,
        os.path.join(sf_dir, "documents.parquet"),
    )
    skel = F.substring(
        F.regexp_replace(F.col("text"), "[^ -~]", ""), 1, EDIT_SKEL_LEN
    )
    # Checkpoint the shingle+skeleton table once per invocation: posting
    # and both verify sides otherwise each re-derived it (same barrier as
    # the rest of the dedup family). Postings are xxhash64 longs (r12
    # session 3, guide §2.3): df counts and shared counts — the only
    # things the candidate stage reads — are hash-agnostic over the
    # array_distinct shingles; the Levenshtein verify reads skeletons,
    # untouched. String-side oracle unchanged.
    sh = d.select(
        "doc_id",
        F.transform(shingles(), lambda s: F.xxhash64(s)).alias("hx"),
        skel.alias("skel"),
    ).localCheckpoint(eager=True)
    posting = sh.select("doc_id", F.explode("hx").alias("shingle"))
    rare = (
        posting.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= STOP_DF)
    )
    rp = posting.join(rare.select("shingle"), "shingle").repartition(
        n_part, "shingle"
    )
    a = rp.alias("a")
    b = rp.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= EDIT_MIN_SHARED)
        .select("doc_a", "doc_b")
        .repartition(n_part, "doc_a")
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("skel").alias("skel_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("skel").alias("skel_b"))
    denom = F.greatest(F.length("skel_a"), F.length("skel_b"), F.lit(1))
    # Two sound prunings before the quadratic-cost kernel (measured 102 s →
    # ~8 s at sf0.1, identical output):
    # 1. length gate: levenshtein(a, b) >= |len(a) - len(b)|, so any pair
    #    whose length gap already exceeds EDIT_REL_T * denom cannot pass —
    #    drop it without computing anything quadratic;
    # 2. early-exit kernel: rel <= EDIT_REL_T over a <= EDIT_SKEL_LEN
    #    skeleton bounds the acceptable distance by
    #    ceil(EDIT_REL_T * EDIT_SKEL_LEN), so the 3-arg levenshtein
    #    (threshold form, banded DP) returns the exact value for every
    #    keepable pair and -1 (dropped) beyond the band — O(len·band)
    #    instead of O(len²) per pair.
    max_lev = int(EDIT_SKEL_LEN * EDIT_REL_T)
    length_gate = (
        F.abs(F.length("skel_a") - F.length("skel_b")) <= EDIT_REL_T * denom
    )
    lev = F.levenshtein(F.col("skel_a"), F.col("skel_b"), max_lev)
    return (
        cand.join(sa, "doc_a")
        .repartition(n_part, "doc_b")  # keeps the Levenshtein stage wide
        .join(sb, "doc_b")
        .filter(length_gate)
        .select(
            "doc_a",
            "doc_b",
            lev.cast("long").alias("edit_distance"),
            denom.alias("denom"),
        )
        .filter(
            (F.col("edit_distance") >= 0)
            & (F.col("edit_distance") <= EDIT_REL_T * F.col("denom"))
        )
        .select(
            "doc_a",
            "doc_b",
            "edit_distance",
            F.round(F.col("edit_distance") / F.col("denom"), 6).alias("rel_edit"),
        )
    )


# ---------------------------------------------------------------------------
# [EXT r4] 64-bit SimHash: the production-width fingerprint, engine-exact
# ---------------------------------------------------------------------------
_DUCK_SIMHASH64 = f"""
        tok AS (
          SELECT doc_id, md5(t) AS h
          FROM (SELECT doc_id, unnest(list_distinct({DUCK_TOKENS.format(col='text')})) AS t FROM documents)
        ),
        bits AS (
          SELECT doc_id, b,
                 ((strpos('0123456789abcdef', substr(h, 1 + b // 4, 1)) - 1) >> (3 - (b % 4))) & 1 AS bit
          FROM tok, (SELECT unnest(generate_series(0, 63)) AS b)
        ),
        votes AS (
          SELECT doc_id, b, sum(2 * bit - 1) AS vote FROM bits GROUP BY doc_id, b
        ),
        fp AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN vote > 0 THEN
                   -- bit 63 spelled as its two's-complement value: DuckDB raises
                   -- Out of Range on 1::BIGINT << 63 (signed overflow) while
                   -- Spark's shiftleft wraps; both agree on the constant below
                   (CASE WHEN b = 63 THEN -9223372036854775808 ELSE (1::BIGINT << b) END)
                 ELSE 0 END) AS BIGINT) AS simhash64
          FROM votes GROUP BY doc_id
        )"""


def simhash64_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash from the first 16 hex chars of each token's md5 —
    the production fingerprint width, still bit-identical across engines
    (the 16-bit form at dedup.py::simhash_fingerprints is kept as the
    cheaper demo; at 5k synthetic docs it emits 3.85M hamming-≤3 pairs
    because 16 bits can't separate a low-entropy corpus — 64 bits can)."""
    d = load_table(spark, sf_dir, "documents")
    tok = (
        _widen_scan(d, spark, __import__("os").path.join(sf_dir, "documents.parquet"))
        .select("doc_id", F.explode(F.array_distinct(tokens("text"))).alias("t"))
        .select("doc_id", F.md5("t").alias("h"))
    )
    bits = tok.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b"), "h"
    ).select(
        "doc_id",
        "b",
        F.expr(
            "((instr('0123456789abcdef', substring(h, 1 + CAST(b / 4 AS INT), 1)) - 1) "
            ">> (3 - b % 4)) & 1"
        ).alias("bit"),
    )
    votes = bits.groupBy("doc_id", "b").agg(F.sum(2 * F.col("bit") - 1).alias("vote"))
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("vote") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash64")
    )


@register(
    "simhash64_near_dup_pairs",
    oracle=f"""
        WITH {_DUCK_SIMHASH64},
        bands AS (
          SELECT doc_id, simhash64, bb.band_id,
                 (simhash64 >> (16 * bb.band_id)) & 65535 AS band_val
          FROM fp, (SELECT unnest(generate_series(0, 3)) AS band_id) bb
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band_id = b.band_id AND a.band_val = b.band_val AND a.doc_id < b.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               bit_count(xor(sa.simhash64, sb.simhash64)) AS hamming
        FROM cand c
        JOIN fp sa ON sa.doc_id = c.doc_a
        JOIN fp sb ON sb.doc_id = c.doc_b
        WHERE bit_count(xor(sa.simhash64, sb.simhash64)) <= {HAMMING_MAX}
    """,
    doc="Production-width 64-bit SimHash near-dup pairs: 4×16-bit bands, hamming ≤ 3 verify — separates a low-entropy corpus the 16-bit demo cannot.",
    tags=("dedup", "ext", "scale"),
)
def simhash64_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash banding: four 16-bit bands; candidates equal on ANY
    band; verify hamming ≤ HAMMING_MAX by xor/bit_count. Same pigeonhole
    recall proof as the 16-bit form, but collision density drops from
    2^-4 per band to 2^-16 — at sf0.1 the 16-bit demo emits 3.85M
    verified pairs on the synthetic corpus while this form emits only
    genuinely near-identical documents. Scale: shuffle keys are band
    values; candidate volume tracks true-duplicate density.
    """
    # Same 4-consumer barrier as simhash_near_dup_pairs.
    fp = simhash64_fingerprints(spark, sf_dir).localCheckpoint(eager=True)
    bands = fp.select(
        "doc_id",
        "simhash64",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band_id"),
    ).select(
        "doc_id",
        "band_id",
        F.expr("shiftrightunsigned(simhash64, 16 * band_id) & 65535").alias("band_val"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash64").alias("sim_a"))
    sb = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash64").alias("sim_b"))
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(hamming <= HAMMING_MAX)
        .select("doc_a", "doc_b", hamming.cast("long").alias("hamming"))
    )


# ---------------------------------------------------------------------------
# [EXT r6] Incremental near-dup vs a PERSISTED MinHash band index
# ---------------------------------------------------------------------------
# Same history/batch split as curation.dedup_incremental (HIST_MOD there;
# curation imports from this module, so the constant lives here to avoid a
# cycle — equality is pinned in tests/test_r6_new_ops.py).
INC_HIST_MOD = 10
INC_HIST_KEEP = 8  # doc_id % INC_HIST_MOD < 8 -> history; rest -> new batch
BAND_INDEX_ROOT = "/tmp/ddl_spark_band_index_v1"


def build_band_index(spark: SparkSession, sf_dir: str, root: str | None = None) -> str:
    """Materialize the HISTORY side of the continuous-ingest near-dup
    store, once per corpus: (a) the LSH band postings
    ``(band_id, band_val, doc_id)`` the probe join hits, and (b) the
    verify-side shingle hashes ``(doc_id, hx array<bigint>)`` so exact
    Jaccard never re-reads or re-shingles history text. Staged into a
    process-private dir then atomically renamed (identical crash/race
    discipline to `build_ivf_index` / `pq_encode_df`; corpus-mtime cache
    key, stale siblings pruned).

    At 100 TB the postings table is bucketed by (band_id, band_val) and
    the shingle store by doc_id, so both probe joins are co-located; the
    store grows by appending each accepted batch's postings — history
    text is never re-scanned.
    """
    import os

    from ..sources.catalog import prune_stale_cache_siblings

    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    slug = sf_dir.strip("/").replace("/", "_")
    default_root = root is None
    root = root or os.path.join(BAND_INDEX_ROOT, f"{slug}_{st.st_mtime_ns}_{st.st_size}")
    marker = os.path.join(root, "_INDEX_COMPLETE")
    if os.path.exists(marker):
        return root

    stage = f"{root}.tmp.{os.getpid()}"
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % INC_HIST_MOD < INC_HIST_KEEP
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sh = (
        _widen_scan(d, spark, __import__("os").path.join(sf_dir, "documents.parquet"))
        .filter(F.col("doc_id") % INC_HIST_MOD < INC_HIST_KEEP)
        .select("doc_id", shingles().alias("sh"))
        .filter(F.size("sh") > 0)
        .select(
            "doc_id",
            F.transform(F.col("sh"), F.md5).alias("hs"),
            F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("hx"),
        )
        .repartition(n_part)
        .localCheckpoint(eager=True)  # shared by both writes below
    )
    bands = _band_signature(sh).select(
        "doc_id",
        F.explode(
            F.create_map(
                *[x for b in range(N_BANDS) for x in (F.lit(f"band_{b}"), F.col(f"band_{b}"))]
            )
        ).alias("band_id", "band_val"),
    )
    bands.write.mode("overwrite").parquet(os.path.join(stage, "bands"))
    sh.select("doc_id", "hx").write.mode("overwrite").parquet(
        os.path.join(stage, "shingles")
    )
    with open(os.path.join(stage, "_INDEX_COMPLETE"), "w") as f:
        f.write("ok")
    try:
        os.rename(stage, root)  # atomic publish (same filesystem)
    except OSError:
        import shutil

        if os.path.exists(marker):  # lost the race to a complete index
            shutil.rmtree(stage, ignore_errors=True)
        else:  # stale half-built tree from a crashed run: replace it
            shutil.rmtree(root, ignore_errors=True)
            os.rename(stage, root)
    if default_root:
        prune_stale_cache_siblings(BAND_INDEX_ROOT, slug, root)
    return root


_DUCK_INC_JACC = (
    "len(list_intersect(sa.sh, sb.sh)) * 1.0"
    " / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))"
)


@register(
    "near_dup_incremental",
    oracle=f"""
        WITH hist_sig AS (
          SELECT doc_id, {_DUCK_BANDS}
          FROM documents
          WHERE doc_id % {INC_HIST_MOD} < {INC_HIST_KEEP} AND len({DUCK_SHINGLES}) > 0
        ),
        hist_bands AS (
          SELECT doc_id, band_id, band_val FROM hist_sig
          UNPIVOT (band_val FOR band_id IN (band_0, band_1, band_2, band_3))
        ),
        batch_sig AS (
          SELECT doc_id, {_DUCK_BANDS}
          FROM documents
          WHERE doc_id % {INC_HIST_MOD} >= {INC_HIST_KEEP} AND len({DUCK_SHINGLES}) > 0
        ),
        batch_bands AS (
          SELECT doc_id, band_id, band_val FROM batch_sig
          UNPIVOT (band_val FOR band_id IN (band_0, band_1, band_2, band_3))
        ),
        cand AS (
          SELECT DISTINCT b.doc_id AS bid, h.doc_id AS hid
          FROM batch_bands b JOIN hist_bands h
            ON b.band_id = h.band_id AND b.band_val = h.band_val
        ),
        sh AS (SELECT doc_id, {DUCK_SHINGLES} AS sh FROM documents),
        dup AS (
          SELECT DISTINCT c.bid
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.bid
          JOIN sh sb ON sb.doc_id = c.hid
          WHERE {_DUCK_INC_JACC} >= 0.5
        ),
        ncand AS (SELECT bid, CAST(count(*) AS BIGINT) AS n FROM cand GROUP BY bid)
        SELECT d.doc_id,
               CAST(coalesce(ncand.n, 0) AS BIGINT) AS n_band_candidates
        FROM documents d LEFT JOIN ncand ON ncand.bid = d.doc_id
        WHERE d.doc_id % {INC_HIST_MOD} >= {INC_HIST_KEEP}
          AND d.doc_id NOT IN (SELECT bid FROM dup)
    """,
    doc="Continuous-ingest NEAR-dup: new batch probes the persisted MinHash band index (band equi-join), exact Jaccard verifies candidates against stored shingle hashes, fresh docs emitted — history is never re-shingled.",
    tags=("dedup", "ext", "lsh", "scale"),
)
def near_dup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production LLM-corpus-ingest shape `dedup_incremental` (exact
    fingerprints) and `near_dup_minhash_verified` (full-corpus batch) each
    cover half of: a NEW batch arrives, its MinHash band signatures probe
    the PERSISTED history band index, exact Jaccard (over the index's
    stored shingle hashes) verifies the band candidates, and only docs
    with no verified near-dup in history are emitted as fresh — with
    their probe fan-out (`n_band_candidates`) for observability.

    History cost at steady state: ZERO recompute — signatures and shingle
    hashes are read from the store built once by `build_band_index`; the
    probe shuffle is ∝ batch size, the verify join touches only candidate
    history docs (never the history corpus). The oracle recomputes both
    sides from scratch in SQL, proving the store's contents equal a
    from-scratch evaluation.
    """
    import os

    root = build_band_index(spark, sf_dir)
    hist_bands = spark.read.parquet(os.path.join(root, "bands"))
    hist_sh = spark.read.parquet(os.path.join(root, "shingles"))

    d = load_table(spark, sf_dir, "documents")
    batch_ids = d.filter(F.col("doc_id") % INC_HIST_MOD >= INC_HIST_KEEP).select(
        "doc_id"
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bsh = (
        _widen_scan(d, spark, os.path.join(sf_dir, "documents.parquet"))
        .filter(F.col("doc_id") % INC_HIST_MOD >= INC_HIST_KEEP)
        .select("doc_id", shingles().alias("sh"))
        .filter(F.size("sh") > 0)
        .select(
            "doc_id",
            F.transform(F.col("sh"), F.md5).alias("hs"),
            F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("hx"),
        )
        .repartition(n_part)
    )
    batch_bands = _band_signature(bsh).select(
        "doc_id",
        F.explode(
            F.create_map(
                *[x for b in range(N_BANDS) for x in (F.lit(f"band_{b}"), F.col(f"band_{b}"))]
            )
        ).alias("band_id", "band_val"),
    )
    cand = (
        batch_bands.alias("b")
        .join(
            hist_bands.alias("h"),
            (F.col("b.band_id") == F.col("h.band_id"))
            & (F.col("b.band_val") == F.col("h.band_val")),
        )
        .select(F.col("b.doc_id").alias("bid"), F.col("h.doc_id").alias("hid"))
        .distinct()
    )
    sa = bsh.select(F.col("doc_id").alias("bid"), F.col("hx").alias("sha"))
    sb = hist_sh.select(F.col("doc_id").alias("hid"), F.col("hx").alias("shb"))
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb")))
    jacc = inter / (F.size("sha") + F.size("shb") - inter)
    dup = (
        cand.join(sa, "bid")
        .join(sb, "hid")
        .filter(jacc >= 0.5)
        .select("bid")
        .distinct()
    )
    ncand = cand.groupBy("bid").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        batch_ids.join(dup, batch_ids.doc_id == dup.bid, "left_anti")
        .join(ncand, batch_ids.doc_id == ncand.bid, "left_outer")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_band_candidates"),
        )
    )


def append_band_index(spark: SparkSession, root: str, batch: DataFrame) -> None:
    """Grow the band index by an ACCEPTED batch: compute the batch's band
    postings + shingle hashes with the exact builders history used and
    append them as new parquet files — existing store files are never
    rewritten (the same append-only discipline as the snapshot table's
    data dir). After this, the batch IS history: a re-probe of the same
    docs candidates against itself at Jaccard 1.0.

    ``batch`` must carry (doc_id, text)."""
    import os

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sh = (
        batch.select("doc_id", shingles().alias("sh"))
        .filter(F.size("sh") > 0)
        .select(
            "doc_id",
            F.transform(F.col("sh"), F.md5).alias("hs"),
            F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("hx"),
        )
        .repartition(min(n_part, 8))
        .localCheckpoint(eager=True)
    )
    bands = _band_signature(sh).select(
        "doc_id",
        F.explode(
            F.create_map(
                *[x for b in range(N_BANDS) for x in (F.lit(f"band_{b}"), F.col(f"band_{b}"))]
            )
        ).alias("band_id", "band_val"),
    )
    bands.write.mode("append").parquet(os.path.join(root, "bands"))
    sh.select("doc_id", "hx").write.mode("append").parquet(
        os.path.join(root, "shingles")
    )


@register(
    "near_dup_index_append_cycle",
    oracle=f"""
        WITH batch AS (
          SELECT doc_id, {DUCK_SHINGLES} AS sh FROM documents
          WHERE doc_id % {INC_HIST_MOD} >= {INC_HIST_KEEP}
        )
        SELECT CAST(count(*) AS BIGINT) AS n_batch,
               -- coalesce twice: len(sh) is NULL for NULL text (those docs
               -- have no signature, hence stay fresh), and sum() over an
               -- empty batch is NULL (fuzz-found, both)
               CAST(coalesce(sum(CASE WHEN coalesce(len(sh), 0) = 0
                                      THEN 1 ELSE 0 END), 0) AS BIGINT)
                 AS n_fresh_after_append
        FROM batch
    """,
    doc="Continuous-ingest index lifecycle: accepted batch's postings APPEND to the band store (no rewrite), after which re-probing the same batch self-matches at Jaccard 1.0 — only shingle-less docs stay 'fresh'.",
    tags=("dedup", "ext", "lsh", "scale"),
)
def near_dup_index_append_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closes the `near_dup_incremental` lifecycle: after a batch is
    ACCEPTED, its signatures append to the persisted band index (history
    grows without rewriting or re-shingling anything), and the proof is a
    RE-PROBE of the same batch — every doc with a non-empty shingle set
    now collides with its own stored signature (Jaccard 1.0 ≥ threshold)
    and is suppressed; exactly the shingle-less docs remain fresh. Both
    counts are SQL-expressible, so the cycle is hash-checked.

    Runs against a throwaway hardlink-free copy of the store build (same
    corpus-keyed builder, private root) so the shared cache keeps serving
    `near_dup_incremental` unmutated.

    Scale: the append writes ∝ batch size; the store is never compacted
    here — a production table would OPTIMIZE the postings files on the
    same schedule as any append-heavy lake table
    (`lake_compact_small_files`).
    """
    import os
    import shutil
    import tempfile

    d = load_table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % INC_HIST_MOD >= INC_HIST_KEEP).select(
        "doc_id", "text"
    )
    work = tempfile.mkdtemp(prefix="sg_bandappend_")
    shutil.rmtree(work)  # build_band_index wants to create it atomically
    try:
        root = build_band_index(spark, sf_dir, root=work)
        append_band_index(spark, root, _widen_scan(
            batch, spark, os.path.join(sf_dir, "documents.parquet")
        ).filter(F.col("doc_id") % INC_HIST_MOD >= INC_HIST_KEEP).select("doc_id", "text"))

        hist_bands = spark.read.parquet(os.path.join(root, "bands"))
        hist_sh = spark.read.parquet(os.path.join(root, "shingles"))
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        bsh = (
            _widen_scan(d, spark, os.path.join(sf_dir, "documents.parquet"))
            .filter(F.col("doc_id") % INC_HIST_MOD >= INC_HIST_KEEP)
            .select("doc_id", shingles().alias("sh"))
            .filter(F.size("sh") > 0)
            .select(
                "doc_id",
                F.transform(F.col("sh"), F.md5).alias("hs"),
                F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("hx"),
            )
            .repartition(n_part)
        )
        batch_bands = _band_signature(bsh).select(
            "doc_id",
            F.explode(
                F.create_map(
                    *[
                        x
                        for b in range(N_BANDS)
                        for x in (F.lit(f"band_{b}"), F.col(f"band_{b}"))
                    ]
                )
            ).alias("band_id", "band_val"),
        )
        cand = (
            batch_bands.alias("b")
            .join(
                hist_bands.alias("h"),
                (F.col("b.band_id") == F.col("h.band_id"))
                & (F.col("b.band_val") == F.col("h.band_val")),
            )
            .select(F.col("b.doc_id").alias("bid"), F.col("h.doc_id").alias("hid"))
            .distinct()
        )
        sa = bsh.select(F.col("doc_id").alias("bid"), F.col("hx").alias("sha"))
        sb = hist_sh.select(F.col("doc_id").alias("hid"), F.col("hx").alias("shb"))
        inter = F.size(F.array_intersect(F.col("sha"), F.col("shb")))
        jacc = inter / (F.size("sha") + F.size("shb") - inter)
        dup = (
            cand.join(sa, "bid").join(sb, "hid").filter(jacc >= 0.5).select("bid").distinct()
        )
        batch_ids = batch.select("doc_id")
        fresh_after = batch_ids.join(
            dup, batch_ids.doc_id == dup.bid, "left_anti"
        ).count()
        n_batch = batch_ids.count()
        return spark.createDataFrame(
            [(n_batch, fresh_after)], "n_batch long, n_fresh_after_append long"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# [EXT r11] STREAMING near-dup vs the persisted band index: the
# continuous-ingest composition a training-data pipeline actually runs
# (r10 verdict missing #3) — micro-batches probe the store, fresh docs
# are emitted, ACCEPTED postings append, so later batches dedup against
# earlier accepted batches too, not just against history.
# ---------------------------------------------------------------------------
STREAM_ND_BATCHES = 3


def probe_band_index(spark: SparkSession, root: str, batch: DataFrame) -> DataFrame:
    """Probe the persisted band store with a (doc_id, text) batch: band
    postings equi-join for candidates, exact Jaccard (>= 0.5) over the
    STORED shingle hashes to verify, returns the FRESH docs
    ``(doc_id, n_band_candidates)`` — the `near_dup_incremental` probe
    factored for reuse by the streaming twin (that query's executed body
    is deliberately left inline: it holds a green driver hash row)."""
    import os

    hist_bands = spark.read.parquet(os.path.join(root, "bands"))
    hist_sh = spark.read.parquet(os.path.join(root, "shingles"))
    bsh = (
        batch.select("doc_id", shingles().alias("sh"))
        .filter(F.size("sh") > 0)
        .select(
            "doc_id",
            F.transform(F.col("sh"), F.md5).alias("hs"),
            F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("hx"),
        )
    )
    batch_bands = _band_signature(bsh).select(
        "doc_id",
        F.explode(
            F.create_map(
                *[
                    x
                    for b in range(N_BANDS)
                    for x in (F.lit(f"band_{b}"), F.col(f"band_{b}"))
                ]
            )
        ).alias("band_id", "band_val"),
    )
    cand = (
        batch_bands.alias("b")
        .join(
            hist_bands.alias("h"),
            (F.col("b.band_id") == F.col("h.band_id"))
            & (F.col("b.band_val") == F.col("h.band_val")),
        )
        .select(F.col("b.doc_id").alias("bid"), F.col("h.doc_id").alias("hid"))
        .distinct()
    )
    sa = bsh.select(F.col("doc_id").alias("bid"), F.col("hx").alias("sha"))
    sb = hist_sh.select(F.col("doc_id").alias("hid"), F.col("hx").alias("shb"))
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb")))
    jacc = inter / (F.size("sha") + F.size("shb") - inter)
    dup = (
        cand.join(sa, "bid").join(sb, "hid").filter(jacc >= 0.5).select("bid").distinct()
    )
    ncand = cand.groupBy("bid").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ids = batch.select("doc_id")
    return (
        ids.join(dup, ids.doc_id == dup.bid, "left_anti")
        .join(ncand, ids.doc_id == ncand.bid, "left_outer")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_band_candidates"),
        )
    )


@register(
    "stream_near_dup_incremental",
    oracle=None,  # Structured Streaming lifecycle; batch-twin pinned in tests
    tags=("dedup", "streaming", "structured", "ext", "lsh", "scale"),
)
def stream_near_dup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest near-dup, end to end: the batch corpus is staged
    as {STREAM_ND_BATCHES} files and replayed as a real Structured
    Streaming file source (``maxFilesPerTrigger=1`` → one micro-batch per
    file, mtime-ordered); each micro-batch's foreachBatch (a) probes the
    persisted MinHash band store (`probe_band_index` — candidates via the
    band equi-join, exact Jaccard over stored shingle hashes), (b) emits
    the fresh docs, and (c) APPENDS only the ACCEPTED docs' postings
    (`append_band_index`), so the store is the growing survivor corpus:
    a batch-2 doc near-duplicating a batch-0 SURVIVOR is rejected, while
    duplicating only a batch-0 REJECT stays fresh — the semantics
    `near_dup_incremental` (one-shot probe, no growth) cannot express.

    The probe is materialized (eager localCheckpoint) BEFORE the append
    mutates the store — otherwise every doc would self-match at
    Jaccard 1.0. Returns the per-batch admission ledger; the sequential
    batch twin (same splits, same helpers, no streaming engine) is
    pinned equal in tests/test_r11_new_ops.py, plus the cross-op
    invariant: batch 0's fresh set == `near_dup_incremental`'s fresh set
    restricted to batch 0 (the store is history-only at that point).

    Scale: per-micro-batch work is ∝ batch size (probe shuffle on band
    values, verify join on candidate ids only); the store grows
    append-only and is compacted on the lake schedule
    (`lake_compact_small_files`). State lives in the store, not the
    stream — restart = resume from the last appended batch.
    """
    import os
    import shutil
    import tempfile

    from ..streaming.events import _stream_state_partitions

    d = load_table(spark, sf_dir, "documents")
    batch_src = d.filter(F.col("doc_id") % INC_HIST_MOD >= INC_HIST_KEEP).select(
        "doc_id", "text"
    )
    work = tempfile.mkdtemp(prefix="sg_stream_nd_idx_")
    shutil.rmtree(work)  # build_band_index wants to create it atomically
    stage = tempfile.mkdtemp(prefix="sg_stream_nd_src_")
    # keyed by batch_id so a RETRIED micro-batch is a no-op (idempotency
    # guard below), not a duplicate ledger row + double-appended postings
    results: dict[int, tuple[int, int]] = {}
    try:
        root = build_band_index(spark, sf_dir, root=work)
        for b in range(STREAM_ND_BATCHES):
            part_dir = os.path.join(stage, f"_w{b}")
            (
                batch_src.filter(F.pmod("doc_id", F.lit(STREAM_ND_BATCHES)) == b)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(part_dir)
            )
            src_file = [f for f in os.listdir(part_dir) if f.endswith(".parquet")][0]
            dst = os.path.join(stage, f"b{b}.parquet")
            shutil.move(os.path.join(part_dir, src_file), dst)
            shutil.rmtree(part_dir)
            # ascending mtimes AND lexicographic names: the file source's
            # admission order is deterministic under either sort key
            os.utime(dst, (1_000_000_000 + b * 100, 1_000_000_000 + b * 100))

        def process(batch_df: DataFrame, batch_id: int) -> None:
            # Idempotent under micro-batch RETRY (r11 ADVICE #3): Spark
            # re-invokes foreachBatch with the SAME batch_id after a
            # transient failure; without this guard the retry would
            # double-append the batch's postings to the store and
            # duplicate its ledger row. Same processed-id discipline as
            # the exactly-once MERGE sink in streaming/events.py.
            if int(batch_id) in results:
                return
            bspark = batch_df.sparkSession
            fresh = probe_band_index(bspark, root, batch_df).localCheckpoint(
                eager=True  # materialize BEFORE the append mutates the store
            )
            n_docs = batch_df.count()
            n_fresh = fresh.count()
            accepted = batch_df.join(fresh.select("doc_id"), "doc_id")
            append_band_index(bspark, root, accepted)
            results[int(batch_id)] = (int(n_docs), int(n_fresh))

        src = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        with _stream_state_partitions(spark):
            q = src.writeStream.foreachBatch(process).start()
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        return spark.createDataFrame(
            [(b, nd, nf, nd - nf) for b, (nd, nf) in sorted(results.items())],
            "batch_id long, n_docs long, n_fresh long, n_dup long",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(stage, ignore_errors=True)


# ---------------------------------------------------------------------------
# [EXT r8] LSH band-tuning profile: the candidate-workload readout for
# every (bands x rows-per-band) split of the 8-hash signature — the
# number that DECIDES the banding config at 100 TB.
# ---------------------------------------------------------------------------
LSH_TUNE_CONFIGS = ((8, 1), (4, 2), (2, 4), (1, 8))  # (n_bands, rows_per_band)


@register(
    "lsh_band_tuning_profile",
    oracle=f"""
        WITH sig AS (
          SELECT doc_id,
                 {", ".join(f"{_duck_minhash(k)} AS m{k}" for k in range(N_HASHES))}
          FROM documents
          WHERE len({DUCK_SHINGLES}) > 0
        ),
        bands AS (
          {" UNION ALL ".join(
            f"SELECT CAST({b} AS BIGINT) AS n_bands,"
            f" CAST({r} AS BIGINT) AS rows_per_band,"
            f" {bi} AS band_idx,"
            f" {' || '.join(f'm{r * bi + k}' for k in range(r))} AS val,"
            f" doc_id FROM sig"
            for b, r in LSH_TUNE_CONFIGS
            for bi in range(b)
          )}
        ),
        buckets AS (
          SELECT n_bands, rows_per_band, band_idx, val,
                 CAST(count(*) AS BIGINT) AS n
          FROM bands GROUP BY 1, 2, 3, 4
        )
        SELECT n_bands, rows_per_band,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_collision_buckets,
               CAST(sum(n * (n - 1)) / 2 AS BIGINT) AS candidate_pairs
        FROM buckets GROUP BY 1, 2
    """,
    doc="Candidate-pair workload for every (bands x rows-per-band) split of the 8-hash minhash signature: more bands/fewer rows = higher recall but more candidate pairs — this profile IS the banding decision, computed as integer bucket statistics without running any of the joins.",
    tags=("dedup", "lsh", "ext", "scale"),
)
def lsh_band_tuning_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tuning table behind `minhash_lsh_candidates`' fixed 4x2
    choice. LSH banding trades recall against join workload: with r rows
    per band and b bands, a pair of similarity s collides with
    probability 1-(1-s^r)^b, and the price is the bucket join over
    Sum-per-bucket C(n,2) candidate pairs. The S-curve is closed-form;
    the WORKLOAD is a property of the corpus — this operator measures it
    for every split of the 8-hash signature (8x1 recall-max, 4x2 the
    shipped default, 2x4, 1x8 precision-max) as pure integer bucket
    statistics: buckets, collision buckets, and implied candidate pairs.
    At 100 TB you run THIS (one aggregate) before committing to the pair
    join a config implies — picking banding blind is how LSH jobs blow
    their shuffle budget.

    Exactness: bucket keys are concatenations of md5-derived minhash
    windows (the engine-portable family every minhash op here shares);
    counts and pair counts are integers.

    Scale: signature build is the usual shingle scan; the profile itself
    is one groupBy over 15 (config, band) explosions of the signature —
    map-side combinable, output bounded by bucket counts; NO pair join
    runs (that is the point).
    """
    import os as _os

    d = load_table(spark, sf_dir, "documents")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sh = (
        _widen_scan(d, spark, _os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", shingles().alias("sh"))
        .filter(F.size("sh") > 0)
        .select("doc_id", F.transform(F.col("sh"), F.md5).alias("hs"))
        .repartition(n_part)
    )
    init = F.struct(*[F.lit("￿").alias(f"m{k}") for k in range(N_HASHES)])
    sig = sh.select(
        "doc_id",
        F.aggregate(
            "hs",
            init,
            lambda acc, h: F.struct(
                *[
                    F.least(acc[f"m{k}"], F.substring(h, 2 * k + 1, 16)).alias(f"m{k}")
                    for k in range(N_HASHES)
                ]
            ),
        ).alias("m"),
    )
    band_rows = [
        F.struct(
            F.lit(b).cast("long").alias("n_bands"),
            F.lit(r).cast("long").alias("rows_per_band"),
            F.lit(bi).alias("band_idx"),
            F.concat(*[F.col("m")[f"m{r * bi + k}"] for k in range(r)]).alias("val"),
        )
        for b, r in LSH_TUNE_CONFIGS
        for bi in range(b)
    ]
    bands = sig.select(F.explode(F.array(*band_rows)).alias("t")).select("t.*")
    buckets = bands.groupBy("n_bands", "rows_per_band", "band_idx", "val").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return buckets.groupBy("n_bands", "rows_per_band").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.when(F.col("n") >= 2, 1).otherwise(0)).cast("long").alias(
            "n_collision_buckets"
        ),
        (F.sum(F.col("n") * (F.col("n") - 1)) / 2).cast("long").alias("candidate_pairs"),
    )


# ---------------------------------------------------------------------------
# [EXT r9b] Prefix-filtered set-similarity self-join (PPJoin family) —
# the THIRD candidate-pruning strategy beside stop-filtering and MinHash
# banding, and the only one of the three that is provably LOSSLESS.
# ---------------------------------------------------------------------------
PFX_THETA_NUM, PFX_THETA_DEN = 1, 2  # Jaccard threshold 0.5, kept rational


@register(
    "near_dup_prefix_filter_jaccard",
    oracle=f"""
        WITH sh AS (
          SELECT doc_id, {DUCK_SHINGLES} AS sh FROM documents
        ),
        posting AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
        cand AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM posting a JOIN posting b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT c.doc_a, c.doc_b,
               round(len(list_intersect(sa.sh, sb.sh)) * 1.0
                     / (len(sa.sh) + len(sb.sh)
                        - len(list_intersect(sa.sh, sb.sh))), 6) AS jaccard
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b
        WHERE len(list_intersect(sa.sh, sb.sh)) * {PFX_THETA_DEN}
              >= (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
                 * {PFX_THETA_NUM}
    """,
    doc="Jaccard >= 0.5 near-dup pairs via PREFIX FILTERING (PPJoin family): tokens globally ordered by ascending document frequency, each doc indexes only its first |x| - ceil(0.5|x|) + 1 tokens, candidates must collide on a prefix token — provably lossless for the threshold, so the oracle is the full quadratic ground truth (the oracle itself verifies no pair was pruned away).",
    tags=("dedup", "ext", "scale"),
)
def near_dup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third way to bound a set-similarity join's candidate set, and
    the only LOSSLESS one: stop-filtering (near_dup_jaccard_stopfiltered)
    drops boilerplate-only pairs by fiat; MinHash banding
    (near_dup_minhash_verified) is probabilistic. Prefix filtering
    (Chaudhuri/Bayardo/Xiao's PPJoin line) is exact: order every doc's
    shingles by GLOBAL rarity (ascending document frequency, shingle as
    tie-break) and index only the first |x| - ceil(theta*|x|) + 1 — if
    J(A,B) >= theta then the overlap is >= ceil(theta*max(|A|,|B|)), too
    large to hide entirely in both suffixes, so some prefix token
    collides. The hash check against the FULL quadratic oracle is
    therefore also a losslessness proof: one pruned-away true pair and
    the row counts split.

    Why it scales: the hottest (most frequent) tokens are exactly the
    ones prefixes exclude — posting lists in the candidate join come
    from the rare end of the vocabulary, so fan-out per token is small
    without any semantic trade (the stop-filter's missed-pair caveat
    disappears). Verification is exact Jaccard on the full sets, only
    over surviving candidates.

    Plan: posting explode -> df aggregate (map-side combinable) -> per-doc
    rank window (PARTITIONED by doc, frames bounded by doc size) ->
    prefix-posting equi-join -> verify join. No quadratic stage anywhere.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", shingles().alias("sh")).filter(F.size("sh") > 0)
    posting = sh.select(
        "doc_id", F.size("sh").alias("sz"), F.explode("sh").alias("shingle")
    )
    dfreq = posting.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    wdoc = Window.partitionBy("doc_id").orderBy("df", "shingle")
    # prefix length |x| - ceil(theta*|x|) + 1, all-integer:
    # ceil(x/2) == (x+1) div 2 for theta = 1/2.
    plen = F.col("sz") - F.expr(
        f"(sz * {PFX_THETA_NUM} + {PFX_THETA_DEN} - 1) div {PFX_THETA_DEN}"
    ) + 1
    prefix = (
        posting.join(dfreq, "shingle")
        .withColumn("rn", F.row_number().over(wdoc))
        .filter(F.col("rn") <= plen)
        .select("doc_id", "shingle")
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size("sa") + F.size("sb") - inter
    return (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sa")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sb")), "doc_b")
        .filter(inter * PFX_THETA_DEN >= union * PFX_THETA_NUM)
        .select(
            "doc_a",
            "doc_b",
            F.round(inter * 1.0 / union, 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# [EXT r12] Retraction (right-to-be-forgotten) through the near-dup store:
# delete history docs WITHOUT rewriting store files, with the re-admission
# semantics a survivor-store delete actually implies.
# ---------------------------------------------------------------------------
RETRACT_MOD = 5  # tombstone set: history docs with doc_id % RETRACT_MOD == 0


@register(
    "near_dup_retract_reprobe",
    oracle=f"""
        WITH hist_sig AS (
          SELECT doc_id, {_DUCK_BANDS}
          FROM documents
          WHERE doc_id % {INC_HIST_MOD} < {INC_HIST_KEEP}
            AND len({DUCK_SHINGLES}) > 0
            AND NOT (doc_id % {RETRACT_MOD} = 0)
        ),
        hist_bands AS (
          SELECT doc_id, band_id, band_val FROM hist_sig
          UNPIVOT (band_val FOR band_id IN (band_0, band_1, band_2, band_3))
        ),
        batch_sig AS (
          SELECT doc_id, {_DUCK_BANDS}
          FROM documents
          WHERE doc_id % {INC_HIST_MOD} >= {INC_HIST_KEEP} AND len({DUCK_SHINGLES}) > 0
        ),
        batch_bands AS (
          SELECT doc_id, band_id, band_val FROM batch_sig
          UNPIVOT (band_val FOR band_id IN (band_0, band_1, band_2, band_3))
        ),
        cand AS (
          SELECT DISTINCT b.doc_id AS bid, h.doc_id AS hid
          FROM batch_bands b JOIN hist_bands h
            ON b.band_id = h.band_id AND b.band_val = h.band_val
        ),
        sh AS (SELECT doc_id, {DUCK_SHINGLES} AS sh FROM documents),
        dup AS (
          SELECT DISTINCT c.bid
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.bid
          JOIN sh sb ON sb.doc_id = c.hid
          WHERE {_DUCK_INC_JACC} >= 0.5
        ),
        ncand AS (SELECT bid, CAST(count(*) AS BIGINT) AS n FROM cand GROUP BY bid)
        SELECT d.doc_id,
               CAST(coalesce(ncand.n, 0) AS BIGINT) AS n_band_candidates
        FROM documents d LEFT JOIN ncand ON ncand.bid = d.doc_id
        WHERE d.doc_id % {INC_HIST_MOD} >= {INC_HIST_KEEP}
          AND d.doc_id NOT IN (SELECT bid FROM dup)
    """,
    doc="Right-to-be-forgotten through the near-dup store: history docs tombstoned by a deletion-vector sidecar (store files never rewritten), then the standard batch probe runs against the retracted store — docs whose only near-dup partners were deleted are RE-ADMITTED as fresh.",
    tags=("dedup", "ext", "lsh", "scale", "lifecycle"),
)
def near_dup_retract_reprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction is the missing third verb of the store lifecycle (build
    → append → RETRACT): a takedown/GDPR delete of history docs must (a)
    not rewrite the append-only store (at 100 TB that is a full-store
    compaction, not a delete), and (b) change probe semantics — a batch
    doc whose only verified near-dup partners were deleted is no longer a
    duplicate OF ANYTHING RETAINED and must be re-admitted.

    Mechanism: the delete commit writes a tombstone doc_id sidecar next
    to the store (the `lake_deletion_vectors` shape, keyed by doc
    identity instead of file position because the postings of one doc
    span many band files); BOTH probe joins overlay it with a broadcast
    anti join — dead postings lose band-join eligibility, dead shingle
    rows can no longer verify. Maintenance folds tombstones into the
    store on the compaction schedule (`lake_compact_small_files`), same
    as DV tables.

    In-op gate: every pre-retraction store file byte-stable after the
    delete commit (the rewrite-free contract). The oracle recomputes the
    retracted probe from scratch in SQL — fresh-set membership AND
    per-doc candidate counts must match, proving the tombstone overlay
    equals true deletion. tests/test_r12_new_ops.py additionally pins
    re-admission: fresh(retracted) ⊋ fresh(full store) on the fixture.

    Scale: the sidecar is O(|deleted|); the overlay is one broadcast
    anti join per probe side; probe shuffle stays ∝ batch size."""
    import os
    import shutil
    import tempfile

    root = build_band_index(spark, sf_dir)  # shared corpus cache, never mutated
    side = tempfile.mkdtemp(prefix="sg_nd_tombstones_")
    try:
        d = load_table(spark, sf_dir, "documents")
        before = _walk_parquet_sizes(root)
        # the delete commit: tombstone ids as a parquet sidecar
        (
            d.filter(
                (F.col("doc_id") % INC_HIST_MOD < INC_HIST_KEEP)
                & (F.col("doc_id") % RETRACT_MOD == 0)
            )
            .select("doc_id")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(side, "tombstones"))
        )
        after = _walk_parquet_sizes(root)
        rewritten = [p for p, sz in before.items() if after.get(p) != sz]
        if rewritten:
            raise RuntimeError(
                f"near_dup_retract_reprobe touched store files: {rewritten[:3]} "
                "(retraction must be sidecar-only)"
            )
        tomb = spark.read.parquet(os.path.join(side, "tombstones"))

        hist_bands = spark.read.parquet(os.path.join(root, "bands")).join(
            F.broadcast(tomb), "doc_id", "left_anti"
        )
        hist_sh = spark.read.parquet(os.path.join(root, "shingles")).join(
            F.broadcast(tomb), "doc_id", "left_anti"
        )

        batch_ids = d.filter(F.col("doc_id") % INC_HIST_MOD >= INC_HIST_KEEP).select(
            "doc_id"
        )
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
        bsh = (
            _widen_scan(d, spark, os.path.join(sf_dir, "documents.parquet"))
            .filter(F.col("doc_id") % INC_HIST_MOD >= INC_HIST_KEEP)
            .select("doc_id", shingles().alias("sh"))
            .filter(F.size("sh") > 0)
            .select(
                "doc_id",
                F.transform(F.col("sh"), F.md5).alias("hs"),
                F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("hx"),
            )
            .repartition(n_part)
        )
        batch_bands = _band_signature(bsh).select(
            "doc_id",
            F.explode(
                F.create_map(
                    *[
                        x
                        for b in range(N_BANDS)
                        for x in (F.lit(f"band_{b}"), F.col(f"band_{b}"))
                    ]
                )
            ).alias("band_id", "band_val"),
        )
        cand = (
            batch_bands.alias("b")
            .join(
                hist_bands.alias("h"),
                (F.col("b.band_id") == F.col("h.band_id"))
                & (F.col("b.band_val") == F.col("h.band_val")),
            )
            .select(F.col("b.doc_id").alias("bid"), F.col("h.doc_id").alias("hid"))
            .distinct()
        )
        sa = bsh.select(F.col("doc_id").alias("bid"), F.col("hx").alias("sha"))
        sb = hist_sh.select(F.col("doc_id").alias("hid"), F.col("hx").alias("shb"))
        inter = F.size(F.array_intersect(F.col("sha"), F.col("shb")))
        jacc = inter / (F.size("sha") + F.size("shb") - inter)
        dup = (
            cand.join(sa, "bid")
            .join(sb, "hid")
            .filter(jacc >= 0.5)
            .select("bid")
            .distinct()
        )
        ncand = cand.groupBy("bid").agg(F.count(F.lit(1)).cast("long").alias("n"))
        out = (
            batch_ids.join(dup, batch_ids.doc_id == dup.bid, "left_anti")
            .join(ncand, batch_ids.doc_id == ncand.bid, "left_outer")
            .select(
                "doc_id",
                F.coalesce("n", F.lit(0)).cast("long").alias("n_band_candidates"),
            )
        )
        # the sidecar dir is reclaimed in finally: materialize
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(side, ignore_errors=True)


def _walk_parquet_sizes(root: str) -> dict:
    """{path: size} for every parquet data file under root (the
    append/retract immutability gate's witness)."""
    import glob as _g
    import os as _o

    return {
        p: _o.path.getsize(p)
        for p in _g.glob(_o.path.join(root, "**", "*.parquet"), recursive=True)
    }


@register(
    "near_dup_compact_tombstones",
    oracle=f"""
        WITH hist_sig AS (
          SELECT doc_id, {_DUCK_BANDS}
          FROM documents
          WHERE doc_id % {INC_HIST_MOD} < {INC_HIST_KEEP}
            AND len({DUCK_SHINGLES}) > 0
            AND NOT (doc_id % {RETRACT_MOD} = 0)
        ),
        hist_bands AS (
          SELECT doc_id, band_id, band_val FROM hist_sig
          UNPIVOT (band_val FOR band_id IN (band_0, band_1, band_2, band_3))
        ),
        batch_sig AS (
          SELECT doc_id, {_DUCK_BANDS}
          FROM documents
          WHERE doc_id % {INC_HIST_MOD} >= {INC_HIST_KEEP} AND len({DUCK_SHINGLES}) > 0
        ),
        batch_bands AS (
          SELECT doc_id, band_id, band_val FROM batch_sig
          UNPIVOT (band_val FOR band_id IN (band_0, band_1, band_2, band_3))
        ),
        cand AS (
          SELECT DISTINCT b.doc_id AS bid, h.doc_id AS hid
          FROM batch_bands b JOIN hist_bands h
            ON b.band_id = h.band_id AND b.band_val = h.band_val
        ),
        sh AS (SELECT doc_id, {DUCK_SHINGLES} AS sh FROM documents),
        dup AS (
          SELECT DISTINCT c.bid
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.bid
          JOIN sh sb ON sb.doc_id = c.hid
          WHERE {_DUCK_INC_JACC} >= 0.5
        ),
        ncand AS (SELECT bid, CAST(count(*) AS BIGINT) AS n FROM cand GROUP BY bid)
        SELECT d.doc_id,
               CAST(coalesce(ncand.n, 0) AS BIGINT) AS n_band_candidates
        FROM documents d LEFT JOIN ncand ON ncand.bid = d.doc_id
        WHERE d.doc_id % {INC_HIST_MOD} >= {INC_HIST_KEEP}
          AND d.doc_id NOT IN (SELECT bid FROM dup)
    """,
    doc="Fold near-dup store tombstones into the layout: rewrite ONLY the store files containing deleted docs' rows (untouched files byte-stable), then the standard probe runs with NO overlay — and must equal the overlay probe exactly (same oracle as near_dup_retract_reprobe: compaction changes layout, never the answer).",
    tags=("dedup", "ext", "lsh", "scale", "lifecycle"),
)
def near_dup_compact_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintenance verb for the band store, symmetric to
    `ann_ivf_compact_tombstones`: after `near_dup_retract_reprobe` leaves
    a tombstone sidecar, a maintenance window REWRITES only the store
    files that contain deleted docs' rows (band postings AND shingle
    hashes), dropping those rows, and deletes the dead originals —
    untouched files are never opened for write. Readers then stop paying
    the per-probe anti join.

    File-level surgery: each store table's touched-file list comes from
    the `_metadata.file_path` hidden column semi-joined with the
    tombstones (bounded by the store's file count); live rows of touched
    files are materialized (localCheckpoint — never read a path being
    modified), appended as new files, then the dead originals are
    unlinked. A production lake makes the swap one metadata commit (the
    WAP shape `lake_wap_publish` demonstrates); the gates below verify
    the same post-conditions structurally.

    In-op gates: untouched files byte-stable AND touched files gone;
    zero tombstoned rows and exact survivor counts in both read-backs.
    Correctness: the post-compaction probe (NO overlay) is hash-checked
    against the SAME from-scratch SQL oracle as the overlay op —
    compaction changes layout, never the answer.

    Scale: rewrite ∝ rows in touched files; with doc-clustered stores a
    delete batch touches few files of many (here the fixture store is
    32 files per table, the worst case); the probe afterwards is the
    standard ∝-batch-size plan."""
    import os
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="sg_nd_compact_")
    shutil.rmtree(work)  # build_band_index publishes by atomic rename
    try:
        root = build_band_index(spark, sf_dir, root=work)
        d = load_table(spark, sf_dir, "documents")
        tomb = (
            d.filter(
                (F.col("doc_id") % INC_HIST_MOD < INC_HIST_KEEP)
                & (F.col("doc_id") % RETRACT_MOD == 0)
            )
            .select("doc_id")
            .localCheckpoint(eager=True)
        )
        before = _walk_parquet_sizes(root)
        for sub in ("bands", "shingles"):
            path = os.path.join(root, sub)
            full = spark.read.parquet(path)
            n_before = full.count()
            n_dead = full.join(F.broadcast(tomb), "doc_id", "left_semi").count()
            touched = [
                r.f
                for r in full.select(
                    "doc_id", F.col("_metadata.file_path").alias("f")
                )
                .join(F.broadcast(tomb), "doc_id", "left_semi")
                .select("f")
                .distinct()
                .collect()  # bounded by the store's file count
            ]
            if not touched:
                continue
            from urllib.parse import urlparse

            local = [urlparse(t).path if t.startswith("file:") else t for t in touched]
            live = (
                spark.read.parquet(*local)
                .join(F.broadcast(tomb), "doc_id", "left_anti")
                .localCheckpoint(eager=True)  # materialize BEFORE mutating
            )
            live.write.mode("append").parquet(path)
            for t in local:
                os.remove(t)
            back = spark.read.parquet(path)
            n_after = back.count()
            still_dead = back.join(F.broadcast(tomb), "doc_id", "left_semi").count()
            if still_dead != 0 or n_after != n_before - n_dead:
                raise RuntimeError(
                    f"near_dup_compact_tombstones fold incomplete in {sub}: "
                    f"{still_dead} dead rows, {n_after} of expected "
                    f"{n_before - n_dead}"
                )
        after = _walk_parquet_sizes(root)
        broken = [
            p
            for p, sz in before.items()
            if p in after and after[p] != sz
        ]
        if broken:
            raise RuntimeError(
                f"near_dup_compact_tombstones rewrote untouched files: "
                f"{broken[:3]} (touched-files-only contract)"
            )
        batch = d.filter(F.col("doc_id") % INC_HIST_MOD >= INC_HIST_KEEP).select(
            "doc_id", "text"
        )
        out = probe_band_index(spark, root, batch)  # NO overlay
        # the private store root is reclaimed in finally: materialize
        return spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)
