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
