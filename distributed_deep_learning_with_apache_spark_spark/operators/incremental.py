"""Incremental / two-phase aggregation patterns ([EXT], r5).

Three operators that exist specifically because of how aggregation behaves
at 100 TB, each exact (hash-oracle-able) despite the approximate or
partitioned mechanism underneath:

- ``incremental_agg_maintenance`` — materialized-view maintenance: merge a
  delta partition's partial aggregate into prior state instead of
  rescanning history. At 100 TB the history scan is the cost; the merge is
  ``O(|delta| + |keys touched|)``.
- ``skew_agg_two_phase`` — salted two-phase aggregation of a pathologically
  low-cardinality key: phase 1 aggregates ``(key, salt)`` so every core
  combines, phase 2 merges the ≤ key×salt partials. Exact because every
  emitted statistic is decomposable (counts/sums add; avg recomputed from
  merged sum/count).
- ``heavy_hitters_sketch_verified`` — count-min sketch → candidate filter →
  exact verify. The sketch is constant memory (d×w cells, map-side
  combinable); the only vocabulary-wide state ever shuffled is for
  candidates, and CM's one-sided overestimate guarantees candidates ⊇ true
  heavy hitters, so the verified output is exact.

Reference provenance: the reference's aggregations are single-pass global
reduces (SparkRDDAPITest.scala:35-39); these are the forms those reduces
must take when the input no longer fits a re-scan or a per-key state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import DUCK_TOKENS, tokens
from ..registry import register
from ..sources.catalog import load_table

# Integer-exact money/value pattern (see SCALE.md "cross-engine round"):
# accumulate floor(x*scale + 0.5) as BIGINT — every step is the same IEEE
# op on identical bits in both engines, so accumulation order can't split.


@register(
    "incremental_agg_maintenance",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(floor(value * 10000 + 0.5)) AS BIGINT) / 10000.0 AS sum_value,
               round(min(value), 6) AS min_value,
               round(max(value), 6) AS max_value
        FROM events
        GROUP BY event_type
    """,
    tags=("incremental", "agg", "ext", "scale"),
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: the per-event_type stats MV is held
    as prior state (all days before the newest) and refreshed by merging
    the newest day's partial aggregate — a full-outer join on the MV key
    with add/least/greatest combiners — never by rescanning history.

    The oracle is the full-table GROUP BY; equality holds because every
    maintained statistic is decomposable (counts and scaled-BIGINT sums
    add exactly; min/max combine via least/greatest). At 100 TB the state
    side is the stored MV (keys × stats, tiny) and the work is
    ``O(|delta|)`` map-side partial agg + a broadcast-sized merge join —
    the same maintenance plan Delta/Iceberg MV pipelines run.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        "value",
        F.floor(F.col("value") * 10000 + 0.5).cast("long").alias("v_scaled"),
    )
    last_day = e.agg(F.max("day").alias("last_day"))

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v_scaled").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    tagged = e.crossJoin(F.broadcast(last_day))
    state = partial(tagged.filter(F.col("day") < F.col("last_day")))  # the stored MV
    delta = partial(tagged.filter(F.col("day") == F.col("last_day")))  # newest partition

    s, d = state.alias("s"), delta.alias("d")
    merged = s.join(d, F.col("s.event_type") == F.col("d.event_type"), "full_outer")
    zero = F.lit(0).cast("long")
    return merged.select(
        F.coalesce(F.col("s.event_type"), F.col("d.event_type")).alias("event_type"),
        (F.coalesce(F.col("s.n"), zero) + F.coalesce(F.col("d.n"), zero)).alias("n_events"),
        # NULL iff no non-null value exists in the whole group (SQL sum
        # semantics); otherwise the absent/all-NULL side contributes 0.
        F.when(
            F.col("s.s").isNull() & F.col("d.s").isNull(), F.lit(None).cast("double")
        )
        .otherwise((F.coalesce(F.col("s.s"), zero) + F.coalesce(F.col("d.s"), zero)) / 10000.0)
        .alias("sum_value"),
        F.round(F.coalesce(F.least(F.col("s.mn"), F.col("d.mn")), F.col("s.mn"), F.col("d.mn")), 6).alias(
            "min_value"
        ),
        F.round(F.coalesce(F.greatest(F.col("s.mx"), F.col("d.mx")), F.col("s.mx"), F.col("d.mx")), 6).alias(
            "max_value"
        ),
    )


N_SALTS = 16


@register(
    "skew_agg_two_phase",
    oracle="""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(floor(l_extendedprice * 100 + 0.5)) AS BIGINT) / 100.0
                 / count(*) AS avg_price,
               CAST(sum(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5))
                    AS BIGINT) / 10000.0 AS revenue
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "skew", "ext", "scale"),
)
def skew_agg_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation of a 3-value key (`l_returnflag` — the
    worst-case skew shape: at 100 TB a single-phase groupBy lands a third
    of the table on one reducer). Phase 1 aggregates ``(key, salt)`` with
    salt = hash(l_orderkey) mod 16, spreading each key over 16 reducers;
    phase 2 merges the ≤ 48 partials. Exact, not approximate: counts and
    scaled-BIGINT sums add associatively, and avg_price is recomputed from
    the merged sum/count (never averaged across partials).

    (Spark's own partial aggregation map-side-combines too — the explicit
    salt is the pattern for HLL/collect-style aggregates whose per-key
    state is large enough that one reducer per key still OOMs.)
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").alias("price_c"),
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5)
        .cast("long")
        .alias("rev_s"),
        F.pmod(F.hash("l_orderkey"), F.lit(N_SALTS)).alias("salt"),
    )
    phase1 = li.groupBy("l_returnflag", "salt").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qty").alias("q"),
        F.sum("price_c").alias("p"),
        F.sum("rev_s").alias("r"),
    )
    return phase1.groupBy("l_returnflag").agg(
        F.sum("n").alias("n_items"),
        F.sum("q").cast("long").alias("sum_qty"),
        (F.sum("p") / 100.0 / F.sum("n")).alias("avg_price"),
        (F.sum("r") / 10000.0).alias("revenue"),
    )


# Count-min sketch geometry: noise bound ≈ n_tok/W per cell (≈0.1% of the
# stream at W=1024) sits far under the T = 2% candidate threshold, so the
# candidate set stays tight to the true heavy set while candidates ⊇ true
# heavy hitters is guaranteed by CM's one-sided overestimate. (The fixture
# corpus has a ~31-token vocabulary — smaller than the sketch, so the
# constant-memory win only shows at real vocabularies of 10⁶⁺; the
# dataflow, guarantees, and plan shape are the production ones.)
CM_W = 1024
CM_D = 4
HH_DENOM = 50  # threshold = ceil(n_tok / 50) = 2% of the token stream


def _token_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per token occurrence over the documents corpus."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(F.explode(tokens("text")).alias("tok"))


@register(
    "heavy_hitters_sketch_verified",
    oracle=f"""
        WITH posting AS (
          SELECT unnest({DUCK_TOKENS.format(col="text")}) AS tok FROM documents
        ),
        n AS (SELECT count(*) AS n_tok FROM posting)
        SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        FROM posting, n
        GROUP BY tok, n.n_tok
        HAVING count(*) >= ceil(n.n_tok / {HH_DENOM}.0)
    """,
    tags=("text", "sketch", "ext", "scale"),
)
def heavy_hitters_sketch_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens (≥ 2% of the stream) via count-min sketch →
    candidate filter → exact verify; the output is EXACT (the oracle is a
    plain GROUP BY ... HAVING) even though the mechanism is approximate,
    because CM only over-estimates: candidates ⊇ true heavy hitters, and
    the verify pass counts candidates exactly.

    Dataflow at 100 TB: (1) sketch build is a groupBy over d×w = 4096
    hash cells — constant-size state, fully map-side combinable, the only
    full-stream shuffle is 4096 rows; (2) the sketch broadcasts (≤ d×w
    rows) and each occurrence probes its d cells via d broadcast hash
    joins, taking the min — a per-row filter, no shuffle; (3) only
    occurrences of candidate bigrams (a small, high-frequency subset)
    reach the exact groupBy. A vocabulary-sized shuffle never happens —
    that is the entire point of the sketch at scale.
    """
    occ = _token_stream(spark, sf_dir)
    total = occ.agg(F.count(F.lit(1)).alias("n_tok"))

    # (1) build: d rows per occurrence -> groupBy (j, cell). Tiny shuffle.
    cells = [
        F.struct(
            F.lit(j).alias("j"),
            F.pmod(F.hash(F.concat_ws("#", F.lit(str(j)), F.col("tok"))), F.lit(CM_W)).alias(
                "cell"
            ),
        )
        for j in range(CM_D)
    ]
    sketch = (
        occ.select(F.explode(F.array(*cells)).alias("jc"))
        .groupBy(F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("c"))
    )

    # (2) probe: per-occurrence estimate = min over the d probed cells,
    # realized as d broadcast joins of the ≤4096-row sketch; then the
    # candidate filter est >= T runs row-local (threshold broadcasts too).
    probed = occ.crossJoin(F.broadcast(total))
    for j in range(CM_D):
        sk = F.broadcast(
            sketch.filter(F.col("j") == j).select(
                F.col("cell").alias(f"cell{j}"), F.col("c").alias(f"c{j}")
            )
        )
        probed = probed.join(
            sk,
            F.pmod(F.hash(F.concat_ws("#", F.lit(str(j)), F.col("tok"))), F.lit(CM_W))
            == F.col(f"cell{j}"),
        )
    est = F.least(*[F.col(f"c{j}") for j in range(CM_D)])
    threshold = F.ceil(F.col("n_tok") / float(HH_DENOM))
    candidates = probed.filter(est >= threshold)

    # (3) verify: exact count over candidate occurrences only.
    return (
        candidates.groupBy("tok", "n_tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= F.ceil(F.col("n_tok") / float(HH_DENOM)))
        .select("tok", "cnt")
    )


# ---------------------------------------------------------------------------
# [EXT r7] Mergeable quantile sketch rollup: bottom-k sample per month,
# prefix-merged into running p50/p99 — the quantile sibling of
# hll_daily_distinct_rollup, and hash-exact because the sketch is
# DETERMINISTIC (a bottom-k sample under a bijective integer hash), not a
# randomized summary.
# ---------------------------------------------------------------------------
QSK_K = 64  # sample size per sketch; rank RSE ~ 1/(2*sqrt(K)) ~ 6%
QSK_P = 2_147_483_647  # Lehmer modulus (2^31 - 1), see setops.SAMPLE_P
QSK_A = 950_706_376  # Fishman-Moore optimal multiplier: large enough that
# any key >= 3 wraps the modulus, so sequential keys scatter (a small
# multiplier leaves small keys UNWRAPPED -> bottom-k degenerates to
# smallest-keys-first, a biased sample)
QSK_C = 11


@register(
    "quantile_sketch_rollup_monthly",
    oracle=f"""
        WITH rows_h AS (
          SELECT date_trunc('month', o_orderdate)::DATE AS month,
                 ((o_orderkey % {QSK_P}) * {QSK_A} + {QSK_C}) % {QSK_P} AS hkey,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM orders
        ),
        monthly AS (
          SELECT month, hkey, cents FROM rows_h
          QUALIFY row_number() OVER (PARTITION BY month ORDER BY hkey) <= {QSK_K}
        ),
        months AS (SELECT DISTINCT month FROM monthly),
        pref AS (
          SELECT m.month AS month, s.hkey, s.cents
          FROM months m JOIN monthly s ON s.month <= m.month
        ),
        merged AS (
          SELECT month, hkey, cents FROM pref
          QUALIFY row_number() OVER (PARTITION BY month ORDER BY hkey) <= {QSK_K}
        ),
        ranked AS (
          SELECT month, cents,
                 row_number() OVER (PARTITION BY month ORDER BY cents, hkey) AS vr,
                 count(*) OVER (PARTITION BY month) AS n
          FROM merged
        )
        SELECT month, CAST(max(n) AS BIGINT) AS n_sample,
               CAST(max(CASE WHEN vr = CAST(ceil(n * 0.50) AS BIGINT)
                             THEN cents END) AS BIGINT) AS est_p50_cents,
               CAST(max(CASE WHEN vr = CAST(ceil(n * 0.99) AS BIGINT)
                             THEN cents END) AS BIGINT) AS est_p99_cents
        FROM ranked GROUP BY month
    """,
    doc=f"Running p50/p99 of order value per month via mergeable bottom-{QSK_K} sketches: each month keeps the {QSK_K} rows with smallest bijective-hash keys (a uniform sample), prefixes merge by union+re-truncate, quantiles are order statistics of the merged sample — deterministic, so hash-exact cross-engine.",
    tags=("incremental", "quantile", "sketch", "ext", "scale"),
)
def quantile_sketch_rollup_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-quantile pattern the exact narrowing
    (`quantile_two_pass_exact`) can't give: a dashboard needs running
    p50/p99 per period WITHOUT re-scanning history each refresh. A
    bottom-k sample under a fixed bijective hash is a mergeable sketch —
    merge(sketch(A), sketch(B)) = sketch(A ∪ B) exactly (union, then keep
    the k smallest keys) — so each month is summarized ONCE into ≤ k rows
    and every running quantile is computed from |months| × k stored rows.
    Unlike KLL/t-digest the sketch is a deterministic function of the
    data, which is what makes the whole rollup hash-checkable against the
    oracle instead of tolerance-pinned.

    Accuracy: the kept rows are a uniform k-sample of the prefix (the
    hash is a bijection, so bottom-k-by-hash = simple random sample
    without replacement); the empirical quantile's rank error is
    ~1/(2*sqrt(k)). Error + mergeability pinned in tests/test_r7_new_ops.

    Scale: per-month bottom-k compiles to WindowGroupLimit (per-partition
    heaps, no full sort); the prefix merge touches months × k rows —
    metadata scale, independent of row count. The reference's global
    reduces (SparkRDDAPITest.scala:35-39) are the k=∞ degenerate case.

    Cross-engine exactness: hash keys and cent values are int64
    throughout; quantile selection is an integer order statistic
    (ceil(n*q) via integer-exact doubles, n <= 64); no FP accumulation
    anywhere.
    """
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    rows_h = o.select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.pmod(F.pmod(F.col("o_orderkey"), QSK_P) * QSK_A + QSK_C, QSK_P).alias(
            "hkey"
        ),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    w_month = Window.partitionBy("month").orderBy("hkey")
    monthly = (
        rows_h.withColumn("rn", F.row_number().over(w_month))
        .filter(F.col("rn") <= QSK_K)
        .drop("rn")
    )
    months = monthly.select("month").distinct()
    # Prefix union: |months| × k sketch rows joined to the month spine —
    # a bounded range join over metadata, never over the fact table.
    pref = months.alias("m").join(
        monthly.alias("s"), F.col("s.month") <= F.col("m.month")
    ).select(F.col("m.month").alias("month"), "s.hkey", "s.cents")
    merged = (
        pref.withColumn("rn", F.row_number().over(w_month))
        .filter(F.col("rn") <= QSK_K)
        .drop("rn")
    )
    ranked = merged.select(
        "month",
        "cents",
        F.row_number()
        .over(Window.partitionBy("month").orderBy("cents", "hkey"))
        .alias("vr"),
        F.count(F.lit(1)).over(Window.partitionBy("month")).alias("n"),
    )
    pick = lambda q: F.max(  # noqa: E731
        F.when(F.col("vr") == F.ceil(F.col("n") * q).cast("long"), F.col("cents"))
    ).cast("long")
    return ranked.groupBy("month").agg(
        F.max("n").cast("long").alias("n_sample"),
        pick(0.50).alias("est_p50_cents"),
        pick(0.99).alias("est_p99_cents"),
    )


# ---------------------------------------------------------------------------
# [EXT r7] KMV (k-minimum-values) distinct sketch with SET INTERSECTION —
# the estimator family HLL can't give (HLL unions only).
# ---------------------------------------------------------------------------
KMV_K = 128
KMV_A = 1_226_874_159  # Fishman-Moore optimal multiplier (see QSK_A note:
# an unwrapped affine map would cluster all hashes near 0 and inflate the
# density estimate ~1000x — caught live on sequential user_ids)
KMV_C = 7


@register(
    "kmv_user_overlap_sketch",
    oracle=f"""
        WITH hashed AS (
          SELECT DISTINCT event_type, user_id,
                 ((user_id % {QSK_P}) * {KMV_A} + {KMV_C}) % {QSK_P} AS hkey
          FROM events WHERE event_type IN ('view', 'purchase')
        ),
        sk AS (
          SELECT event_type, user_id, hkey,
                 row_number() OVER (PARTITION BY event_type ORDER BY hkey) AS rn
          FROM hashed
        ),
        kept AS (SELECT * FROM sk WHERE rn <= {KMV_K}),
        kth AS (
          SELECT event_type, max(hkey) AS kth_hkey,
                 CAST(count(*) AS BIGINT) AS k_eff
          FROM kept GROUP BY event_type
        ),
        uni AS (
          SELECT DISTINCT user_id, hkey FROM kept
          ORDER BY hkey LIMIT {KMV_K}
        ),
        uni_kth AS (
          SELECT max(hkey) AS kth_hkey, CAST(count(*) AS BIGINT) AS k_eff
          FROM uni
        ),
        inter AS (
          SELECT CAST(count(*) AS BIGINT) AS n_both
          FROM uni u
          WHERE EXISTS (SELECT 1 FROM kept a WHERE a.event_type = 'view'
                          AND a.user_id = u.user_id)
            AND EXISTS (SELECT 1 FROM kept b WHERE b.event_type = 'purchase'
                          AND b.user_id = u.user_id)
        )
        SELECT t.event_type,
               t.k_eff,
               CASE WHEN t.k_eff < {KMV_K} THEN t.k_eff
                    ELSE CAST(floor((t.k_eff - 1) * {QSK_P}.0 / t.kth_hkey + 0.5)
                              AS BIGINT) END AS est_distinct,
               (SELECT CASE
                  WHEN uk.k_eff < {KMV_K} THEN i.n_both
                  ELSE CAST(floor(i.n_both * 1.0 / uk.k_eff
                       * ((uk.k_eff - 1) * {QSK_P}.0 / uk.kth_hkey) + 0.5) AS BIGINT)
                END FROM inter i, uni_kth uk) AS est_intersection
        FROM kth t
    """,
    doc=f"KMV bottom-{KMV_K} distinct sketches per event type + Jaccard-style intersection estimate over the union sketch — the set-operation distinct estimator (HLL can only union); deterministic hash, so cross-engine hash-exact.",
    tags=("incremental", "sketch", "approx", "ext", "scale"),
)
def kmv_user_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many users both VIEW and PURCHASE, without ever holding either
    user set: KMV keeps the k smallest hash values per side; the k-th
    smallest estimates density ((k-1)·P/h_k ≈ distinct count), and the
    union sketch's members that appear in BOTH sides estimate the Jaccard
    ratio, giving |A ∩ B| ≈ ρ · est(|A ∪ B|) — the classic bottom-k
    set-operation estimator (Beyer et al., SIGMOD'07), which HLL
    structurally cannot do. Deterministic bijective hash → the whole
    pipeline is hash-exact cross-engine (vs the HLL rollup's rows-only
    check).

    Output: one row per event type with its sketch-estimated distinct
    users, plus the shared intersection estimate (same value on both rows
    — kept per-row so the result is a single flat driver-hashable table).

    Accuracy: RSE ≈ 1/sqrt(k-1) ≈ 9% at k=128; pinned vs exact counts in
    tests/test_r7_new_ops.py.

    Scale: per-side bottom-k is WindowGroupLimit over the deduped
    (type, user) pairs — the only full-data op is that dedup, a map-side
    combinable aggregate; everything after runs on ≤ 2k sketch rows. At
    100 TB you'd persist the per-day sketches like the band index and
    merge on read (union = concat + re-truncate, associative).
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    hashed = (
        e.select("event_type", "user_id")
        .distinct()
        .withColumn(
            "hkey", F.pmod(F.pmod(F.col("user_id"), QSK_P) * KMV_A + KMV_C, QSK_P)
        )
    )
    w_side = Window.partitionBy("event_type").orderBy("hkey")
    kept = (
        hashed.withColumn("rn", F.row_number().over(w_side))
        .filter(F.col("rn") <= KMV_K)
        .drop("rn")
        .localCheckpoint(eager=False)  # reused 4x below; ≤ 2k rows
    )
    kth = kept.groupBy("event_type").agg(
        F.max("hkey").alias("kth_hkey"), F.count(F.lit(1)).cast("long").alias("k_eff")
    )
    uni = (
        kept.select("user_id", "hkey")
        .distinct()
        .orderBy("hkey")
        .limit(KMV_K)
        .localCheckpoint(eager=False)
    )
    uni_kth = uni.agg(
        F.max("hkey").alias("u_kth"), F.count(F.lit(1)).cast("long").alias("u_k")
    )
    views = kept.filter(F.col("event_type") == "view").select("user_id")
    buys = kept.filter(F.col("event_type") == "purchase").select("user_id")
    n_both = (
        uni.join(views, "user_id", "left_semi")
        .join(buys, "user_id", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    # A sketch that never FILLED holds the entire value set — its "estimate"
    # is the exact count, not the density extrapolation (which is biased
    # low by (k-1)/k when k_eff < K).
    est_union = (F.col("u_k") - 1) * float(QSK_P) / F.col("u_kth")
    inter_est = n_both.crossJoin(uni_kth).select(
        F.when(F.col("u_k") < KMV_K, F.col("n_both"))
        .otherwise(
            F.floor(F.col("n_both") * 1.0 / F.col("u_k") * est_union + 0.5).cast(
                "long"
            )
        )
        .cast("long")
        .alias("est_intersection")
    )
    return kth.crossJoin(F.broadcast(inter_est)).select(
        "event_type",
        "k_eff",
        F.when(F.col("k_eff") < KMV_K, F.col("k_eff"))
        .otherwise(
            F.floor(
                (F.col("k_eff") - 1) * float(QSK_P) / F.col("kth_hkey") + 0.5
            ).cast("long")
        )
        .cast("long")
        .alias("est_distinct"),
        "est_intersection",
    )


# ---------------------------------------------------------------------------
# [EXT r7] Incremental JOIN-view maintenance: fact deltas AND dimension
# updates applied to a stored join MV without re-joining history — the
# two-tier (supporting MV + derived MV) pattern of classical IVM.
# ---------------------------------------------------------------------------
_TIER_CASE = (
    "CASE WHEN {b} < 0 THEN 'debt' WHEN {b} < 2500 THEN 'low' "
    "WHEN {b} < 5000 THEN 'mid' ELSE 'high' END"
)


@register(
    "incremental_join_maintenance",
    oracle=f"""
        WITH updates AS (
          SELECT user_id AS key, round(value, 2) AS new_balance
          FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
          ) WHERE rn = 1
        ),
        cur AS (
          SELECT c.c_custkey,
                 round(coalesce(u.new_balance, c.c_acctbal), 2) AS bal
          FROM customer c LEFT JOIN updates u ON u.key = c.c_custkey
        ),
        tiers AS (
          SELECT c_custkey, {_TIER_CASE.format(b='bal')} AS tier FROM cur
        )
        SELECT t.tier,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM orders o JOIN tiers t ON o.o_custkey = t.c_custkey
        GROUP BY t.tier
    """,
    doc="Join-MV maintenance under BOTH fact deltas (newest order day) and dimension updates (balance changes moving customers across tiers): stored per-customer supporting MV + move/insert deltas, never a history re-join — must hash-equal the full orders-joins-current-customers recompute.",
    tags=("incremental", "merge", "agg", "ext", "scale"),
)
def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`incremental_agg_maintenance` handles a delta on ONE table; real
    MVs join a fact to a dimension and BOTH change. Classical IVM (Gupta
    & Mumick) solves it with a two-tier scheme, realized here for
    revenue-per-balance-tier:

    - supporting MV: per-customer (n, revenue) over HISTORICAL orders —
      maintained additively, the already-registered pattern;
    - derived MV: tier-level rollup of the supporting MV joined to the
      customer's CURRENT tier.

    Maintenance applies three delta streams to the STORED derived MV,
    touching only changed keys:
    1. MOVE: a balance update that crosses a tier boundary subtracts the
       customer's supporting-MV contribution from the old tier and adds
       it to the new (two rows per moved customer — never a re-join of
       their order history);
    2. INSERT: the newest day's orders aggregate per customer and land at
       the customer's new tier;
    and the result must hash-equal the oracle's full re-join against
    current balances — the equality that PROVES no maintenance path was
    forgotten (e.g. a moved customer's same-day new orders must use the
    NEW tier).

    Scale: every step is keys-touched-sized — Δorders agg ∝ delta, moves
    ∝ changed customers, and the stored MVs are |customers| and |tiers|
    rows; the order history is scanned once at MV build time, never at
    maintenance time. Decomposable stats only (counts/sums; avg would be
    recomputed from them).
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("day"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    updates = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("user_id").alias("key"), F.round("value", 2).alias("new_balance"))
    )

    def tier(b):
        return (
            F.when(b < 0, "debt")
            .when(b < 2500, "low")
            .when(b < 5000, "mid")
            .otherwise("high")
        )

    dim = c.join(updates, c.c_custkey == F.col("key"), "left").select(
        "c_custkey",
        tier(F.round("c_acctbal", 2)).alias("old_tier"),
        tier(F.round(F.coalesce("new_balance", "c_acctbal"), 2)).alias("new_tier"),
    )

    last_day = o.agg(F.max("day").alias("last_day"))
    tagged = o.crossJoin(F.broadcast(last_day))
    hist = tagged.filter(F.col("day") < F.col("last_day"))
    delta = tagged.filter(F.col("day") == F.col("last_day"))

    # Supporting MV (stored): per-customer stats over history.
    smv = hist.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents"),
    )
    # Derived MV (stored): tier rollup as of the OLD dimension state.
    mv_old = (
        smv.join(dim, smv.o_custkey == dim.c_custkey)
        .groupBy(F.col("old_tier").alias("tier"))
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    )
    # Delta 1: tier moves — ± the supporting-MV contribution, changed keys only.
    moved = smv.join(
        dim.filter(F.col("old_tier") != F.col("new_tier")),
        smv.o_custkey == dim.c_custkey,
    )
    move_minus = moved.select(
        F.col("old_tier").alias("tier"), (-F.col("n")).alias("n"), (-F.col("cents")).alias("cents")
    )
    move_plus = moved.select(
        F.col("new_tier").alias("tier"), F.col("n"), F.col("cents")
    )
    # Delta 2: the newest day's orders, joined at the NEW tier.
    ins = (
        delta.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n"), F.sum("cents").cast("long").alias("cents"))
        .join(dim, F.col("o_custkey") == dim.c_custkey)
        .select(F.col("new_tier").alias("tier"), "n", "cents")
    )
    return (
        mv_old.unionByName(move_minus)
        .unionByName(move_plus)
        .unionByName(ins)
        .groupBy("tier")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .filter(F.col("n_orders") > 0)
    )


# ---------------------------------------------------------------------------
# [EXT r8] Count-min ESTIMATE profile with engine-portable hashes — the
# sketch-accuracy readout (true vs estimated vs overestimate) that
# heavy_hitters_sketch_verified deliberately hides behind its exact
# verify pass. Three independent Lehmer rows reuse the proven
# Fishman-Moore multipliers (the r7 small-multiplier lesson).
# ---------------------------------------------------------------------------
CME_W = 512  # cells per row: noise bound ~ n_events/W per cell
CME_TOP = 10  # profile the top-N users by exact count
CME_ROWS = (  # (A, C) per CM row — the three proven Lehmer parameter pairs
    (742_938_285, 362_437),
    (950_706_376, 11),
    (1_226_874_159, 7),
)


def _cme_cell_sql(key_sql: str, a: int, c: int) -> str:
    """Portable CM cell index: Lehmer affine mod P, folded to W cells.
    Shared verbatim by both engines (all-integer, non-negative input)."""
    return f"((({key_sql} % {QSK_P}) * {a} + {c}) % {QSK_P}) % {CME_W}"


@register(
    "countmin_estimate_profile",
    oracle=f"""
        WITH ev AS (SELECT user_id FROM events),
        c0 AS (SELECT {_cme_cell_sql("user_id", *CME_ROWS[0])} AS cell,
                      CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1),
        c1 AS (SELECT {_cme_cell_sql("user_id", *CME_ROWS[1])} AS cell,
                      CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1),
        c2 AS (SELECT {_cme_cell_sql("user_id", *CME_ROWS[2])} AS cell,
                      CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1),
        top AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS true_n
          FROM ev GROUP BY user_id
          ORDER BY true_n DESC, user_id ASC LIMIT {CME_TOP}
        )
        SELECT t.user_id, t.true_n,
               least(a.c, b.c, d.c) AS est_n,
               least(a.c, b.c, d.c) - t.true_n AS over_n
        FROM top t
        JOIN c0 a ON a.cell = {_cme_cell_sql("t.user_id", *CME_ROWS[0])}
        JOIN c1 b ON b.cell = {_cme_cell_sql("t.user_id", *CME_ROWS[1])}
        JOIN c2 d ON d.cell = {_cme_cell_sql("t.user_id", *CME_ROWS[2])}
    """,
    doc=f"Count-min sketch estimates for the top-{CME_TOP} users, with the one-sided error exposed (est - true >= 0 always, bounded by ~n/{CME_W} per independent row): the sketch-ACCURACY readout, hash-exact because the hashes are portable Lehmer maps and the counters are integer sums.",
    tags=("events", "sketch", "ext", "scale"),
)
def countmin_estimate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min sketch with its error bars showing: per heavy user,
    the TRUE count, the sketch ESTIMATE (min over 3 independent counter
    rows), and the overestimate. `heavy_hitters_sketch_verified` uses CM
    as an internal candidate filter and publishes only exact counts; this
    op publishes the estimates themselves — what a monitoring dashboard
    reads when the exact pass is too expensive to run per tick — and
    hash-checks them cross-engine, which requires the portable Lehmer
    hashes (Spark's F.hash is JVM-private; the r7 KMV lesson supplies the
    multipliers that actually wrap sequential ids).

    Property pinned in tests: est_n >= true_n for EVERY key (CM never
    underestimates — counters only ever add), with the expected noise
    ~ n_events/{CME_W} per row.

    Scale: the counters are three {CME_W}-cell integer aggregates — pure
    SUMs, so they map-side combine and MERGE across partitions, days, or
    streams (the mergeable-sketch family contract: the full-stream
    shuffle is 3x{CME_W} rows, constant at any corpus size). Probes are
    broadcast joins of {CME_W}-row tables.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    counters = []
    for a, c in CME_ROWS:
        counters.append(
            ev.selectExpr(f"{_cme_cell_sql('user_id', a, c)} AS cell")
            .groupBy("cell")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("true_n"))
        .orderBy(F.col("true_n").desc(), F.col("user_id").asc())
        .limit(CME_TOP)
    )
    probed = top
    for j, (a, c) in enumerate(CME_ROWS):
        sk = counters[j].select(
            F.col("cell").alias(f"cell{j}"), F.col("c").alias(f"c{j}")
        )
        probed = probed.join(
            F.broadcast(sk),
            F.expr(_cme_cell_sql("user_id", a, c)) == F.col(f"cell{j}"),
        )
    est = F.least(F.col("c0"), F.col("c1"), F.col("c2"))
    return probed.select(
        "user_id",
        "true_n",
        est.alias("est_n"),
        (est - F.col("true_n")).alias("over_n"),
    )


# ---------------------------------------------------------------------------
# [EXT r8] Incremental aggregate maintenance WITH RETRACTIONS — the delete
# path `incremental_agg_maintenance` (insert-only) and
# `incremental_join_maintenance` (insert/update) do not exercise: a CDC
# delta of I- and D-rows maintains a grouped aggregate, including making
# groups DISAPPEAR when their maintained count reaches zero.
# ---------------------------------------------------------------------------
@register(
    "ivm_agg_retractions",
    oracle="""
        WITH base AS (
          SELECT * FROM orders WHERE o_orderkey % 10 != 0
        ),
        deletes AS (
          SELECT * FROM base WHERE o_custkey % 13 = 0 OR o_orderkey % 7 = 0
        ),
        inserts AS (
          SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey,
                 o_totalprice + 1.0 AS o_totalprice
          FROM orders WHERE o_orderkey % 10 = 0
        ),
        current_rows AS (
          SELECT o_custkey, o_totalprice FROM base
          WHERE NOT (o_custkey % 13 = 0 OR o_orderkey % 7 = 0)
          UNION ALL
          SELECT o_custkey, o_totalprice FROM inserts
        )
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM current_rows GROUP BY o_custkey
    """,
    doc="Grouped-aggregate view maintained through a CDC delta containing DELETES: counts and sums apply signed deltas, and a group whose maintained count hits zero is REMOVED (sum alone cannot distinguish empty from zero — the classic retraction subtlety); hash-equal to a full recompute of the post-delta state.",
    tags=("relational", "incremental", "ext", "scale"),
)
def ivm_agg_retractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retraction half of incremental view maintenance. Insert-only
    maintenance (`incremental_agg_maintenance`) only ever adds; real CDC
    feeds carry deletes, and a maintained SUM/COUNT view must (a) apply
    them as SIGNED deltas and (b) drop a group when its maintained count
    reaches zero — keeping a (0, 0) row or, worse, a (0, nonzero-sum)
    row is the classic IVM bug this op pins against. The oracle is a
    FULL RECOMPUTE of the post-delta state, so hash-equality proves no
    maintenance path was forgotten.

    Delta model (deterministic, engine-shared): base = orderkey%10 != 0;
    deletes = whole customers (custkey%13 == 0 — groups that must
    disappear) plus scattered rows (orderkey%7 == 0 — partial
    retractions); inserts = fresh keys (offset by 1e9) with a price bump.

    Scale: the maintained view never re-reads history — the delta
    aggregates map-side to one signed row per TOUCHED group, then a
    keys-touched-sized outer merge against the view. At 100 TB the merge
    cost is O(|touched groups|), not O(|history|) — the whole point of
    IVM.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    base = o.filter(F.col("o_orderkey") % 10 != 0)
    view_old = base.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(cents).cast("long").alias("revenue_cents"),
    )
    deletes = base.filter(
        (F.col("o_custkey") % 13 == 0) | (F.col("o_orderkey") % 7 == 0)
    ).select("o_custkey", cents.alias("c"), F.lit(-1).alias("sign"))
    inserts = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_custkey",
            F.floor((F.col("o_totalprice") + 1.0) * 100 + 0.5)
            .cast("long")
            .alias("c"),
            F.lit(1).alias("sign"),
        )
    )
    delta = (
        deletes.unionByName(inserts)
        .groupBy("o_custkey")
        .agg(
            F.sum("sign").cast("long").alias("dn"),
            F.sum(F.col("sign") * F.col("c")).cast("long").alias("dcents"),
        )
    )
    merged = view_old.join(delta, "o_custkey", "full_outer").select(
        "o_custkey",
        (F.coalesce("n_orders", F.lit(0)) + F.coalesce("dn", F.lit(0)))
        .cast("long")
        .alias("n_orders"),
        (F.coalesce("revenue_cents", F.lit(0)) + F.coalesce("dcents", F.lit(0)))
        .cast("long")
        .alias("revenue_cents"),
    )
    # the retraction subtlety: a group whose maintained COUNT reaches zero
    # must disappear from the view, whatever its (necessarily zero) sum.
    return merged.filter(F.col("n_orders") > 0)


# ---------------------------------------------------------------------------
# [EXT r9b] Bitmap-index exact distinct counting — the roaring-bitmap
# pattern: per-day user presence as 32-bit machine words, merged with
# bit_or, counted with bit_count. Exact where HLL/KMV estimate.
# ---------------------------------------------------------------------------
BITMAP_WORD_BITS = 32  # keep word values in [0, 2^32): positive in BIGINT
                       # on both engines, no sign-bit/two's-complement hazard


@register(
    "bitmap_distinct_users",
    oracle=f"""
        WITH words AS (
          SELECT CAST(ts AS DATE) AS day,
                 user_id // {BITMAP_WORD_BITS} AS word_idx,
                 bit_or(CAST(1 AS BIGINT) << CAST(user_id % {BITMAP_WORD_BITS}
                                                  AS INTEGER)) AS word
          FROM events GROUP BY 1, 2
        )
        SELECT day,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(bit_count(word)) AS BIGINT) AS distinct_users
        FROM words GROUP BY day
    """,
    doc=f"Exact per-day distinct users via a bitmap index: presence bits packed into {BITMAP_WORD_BITS}-bit machine words (word = user_id/{BITMAP_WORD_BITS}, bit = user_id%{BITMAP_WORD_BITS}), merged with the associative bit_or, counted with bit_count — COUNT(DISTINCT) at O(|id domain|/8) bytes of mergeable state, the roaring-bitmap pattern.",
    tags=("events", "sketch", "incremental", "ext", "scale"),
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT user_id) per day WITHOUT a distinct shuffle of the
    id universe: each (day, word) cell ORs presence bits for 32
    consecutive ids, so the aggregate state is dense machine words —
    map-side combinable (bit_or is associative/commutative/idempotent),
    mergeable across days/partitions/streams by the same OR, and EXACT,
    which is the whole advantage over HLL when the id domain is dense
    integers (the roaring-bitmap / Druid segment-bitmap design point).
    Popcount(word) sums to the exact distinct count.

    Exactness: bits 0..31 in a BIGINT — never the sign bit, so shifts,
    bit_or, and bit_count agree across engines with no two's-complement
    edge (probed; the simhash64 1<<63 lesson).

    Scale: state is |days| x |id domain|/32 words regardless of event
    count; both aggregates are hash aggregates with map-side combine.
    For sparse/huge id domains, switch the word payload to compressed
    containers (roaring) — the dense-word plumbing here is the merge
    contract that matters.
    """
    e = load_table(spark, sf_dir, "events")
    words = (
        e.select(
            F.to_date("ts").alias("day"),
            # integer div, never FP: ids >= 2^53 would round the double
            # quotient before truncation and land bits in the wrong word.
            # Loud non-negative guard (r9 ADVICE #1): a NEGATIVE id under
            # Spark div/pmod silently COLLIDES bits (-1 and 31 both set
            # word 0 bit 31 — an undercount, not an error) while DuckDB
            # would attempt a negative shift; neither is acceptable, so
            # the precondition raises. assert_true returns NULL on pass,
            # preserving the word index's type and value. A NULL user_id
            # ALSO raises (assert_true errors on a NULL condition) — an
            # INTENTIONAL NULL-reject (r10 ADVICE): a presence bitmap is
            # keyed by identity, and a NULL identity is a data-contract
            # violation to surface loudly, not a value to propagate.
            F.when(
                F.assert_true(
                    F.col("user_id") >= 0,
                    F.lit(
                        "bitmap_distinct_users: negative user_id — the "
                        "presence-bitmap word/bit mapping requires "
                        "non-negative ids (remap or offset upstream)"
                    ),
                ).isNull(),
                F.expr(f"user_id div {BITMAP_WORD_BITS}"),
            ).alias("word_idx"),
            # SQL shiftleft: the pyspark wrapper only takes a literal shift
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pmod(user_id, {BITMAP_WORD_BITS}) AS INT))"
            ).alias("mask"),
        )
        .groupBy("day", "word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    return words.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.bit_count("word")).cast("long").alias("distinct_users"),
    )
