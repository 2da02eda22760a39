"""Distributed global row ranks — the parallel replacement for
``row_number()/ntile() OVER (ORDER BY ...)`` global-order windows.

A global-ORDER window compiles to an ``Exchange SinglePartition`` + one
sort on one task: correct, but a serialization that grows with the row
set (the r9 30x curves measured 2.97x wall for 3x data on exactly this
shape). ``global_row_ranks`` produces the identical 1-based global rank
with every data-proportional pass partition-parallel:

1. ``repartitionByRange`` on the order spec, so ascending partition ids
   hold ascending key ranges (ties impossible when the spec ends in a
   unique tiebreak column — the callers' contract);
2. pin the partition assignment with an eager ``localCheckpoint`` —
   BOTH consumers (the per-partition counts collect and the returned
   plan) must see the same pid, the topk.py:460 / decision_support
   ``_value_prefix_counts`` discipline;
3. count rows per partition, collect those <= ``num_parts`` rows, and
   prefix-sum them on the driver (the only serial state: a 32-row
   offset table);
4. broadcast the offsets back; each partition finishes its ranks
   locally with a pid-local ``row_number`` window.

``ntile_from_rank`` then turns a global rank into the exact
``ntile(k)`` bucket in closed form (first ``n mod k`` buckets hold
``n//k + 1`` rows — the ANSI ntile contract both Spark and DuckDB
implement), as a scan-stage integer expression: no window at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

RANK_PARTS = 32


def global_row_ranks(
    spark: SparkSession,
    df: DataFrame,
    order_spec: list[tuple[str, bool]],
    rank_col: str = "rnk",
    num_parts: int = RANK_PARTS,
) -> tuple[DataFrame, int]:
    """Append the 1-based GLOBAL rank of every row under the total order
    ``order_spec`` ([(column, ascending), ...] — must end in a unique
    tiebreak column so the order is total) without a single-partition
    sort. Returns ``(df_with_rank, n_rows)``; ``n_rows`` is an exact
    Python int (it feeds closed-form ntile math and overflow guards).
    """
    sort_cols = [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_spec
    ]
    pdf = (
        df.repartitionByRange(num_parts, *sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin pid: both consumers must agree
    )
    stats = (
        pdf.groupBy("__pid")
        .agg(F.count(F.lit(1)).cast("long").alias("pc"))
        .collect()
    )  # bounded: one row per range partition (<= num_parts)
    run = 0
    offsets = []
    for row in sorted(stats, key=lambda r: r["__pid"]):
        offsets.append((row["__pid"], run))
        run += int(row["pc"])
    offsets_df = spark.createDataFrame(offsets or [], "__pid int, __off long")
    wloc = Window.partitionBy("__pid").orderBy(*sort_cols)
    ranked = (
        pdf.join(F.broadcast(offsets_df), "__pid")
        .withColumn(
            rank_col,
            (F.col("__off") + F.row_number().over(wloc)).cast("long"),
        )
        .drop("__pid", "__off")
    )
    return ranked, run


def ntile_frontiers(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    asc: bool,
    tiebreak_col: str,
    k: int,
    num_parts: int = RANK_PARTS,
) -> tuple[int, list[tuple]]:
    """Exact ``ntile(k)`` FRONTIERS of ``df`` under the total order
    (``value_col`` asc/desc, ``tiebreak_col`` asc) — the k-1 rows at
    ranks b_t = t*(n//k) + min(t, n%k) — without ranking ANY row:

    1. one map-side-combinable per-value count aggregate (the value
       domain, usually far smaller than the row set);
    2. a distributed prefix-sum over that SLIM table (range-repartition,
       pinned pids, <= num_parts-row offset collect);
    3. a <= k-1-row boundary probe (broadcast nested-loop against the
       cumulative counts);
    4. only when a boundary falls strictly INSIDE a tie block, one
       distributed rank pass over that single block to find the
       tiebreak threshold (at most k-1 such passes).

    Returns ``(n, frontiers)``; each frontier is ``(v_t, ck_t)`` where
    ``ck_t is None`` means the whole ``v_t`` block lies at-or-before the
    boundary (value-only comparison suffices). Rows scoring with
    ``ntile_score_expr`` then need ONE scan with k-1 broadcast-literal
    comparisons per axis — tile assignment is a scan-stage predicate,
    the form the 100 TB deployment wants.
    """
    if k <= 0:
        raise ValueError(f"ntile_frontiers needs k >= 1; got {k}")
    vorder = F.col(value_col).asc() if asc else F.col(value_col).desc()
    pv = df.groupBy(value_col).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    pv = (
        pv.repartitionByRange(num_parts, vorder)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin pid: both consumers must agree
    )
    stats = (
        pv.groupBy("__pid").agg(F.sum("__c").cast("long").alias("pc")).collect()
    )
    run = 0
    offsets = []
    for row in sorted(stats, key=lambda r: r["__pid"]):
        offsets.append((row["__pid"], run))
        run += int(row["pc"])
    n = run
    if n == 0:
        return 0, []
    offsets_df = spark.createDataFrame(offsets, "__pid int, __off long")
    wloc = Window.partitionBy("__pid").orderBy(vorder)
    cum = pv.join(F.broadcast(offsets_df), "__pid").select(
        value_col,
        "__c",
        (F.col("__off") + F.sum("__c").over(wloc)).cast("long").alias("__cum"),
    )
    q, r = divmod(n, k)
    # one boundary per tile edge t = 1..k-1 (duplicates legitimate when
    # n < k: equal frontiers are counted once per edge by the scorer)
    bdf = spark.createDataFrame(
        [(t, t * q + min(t, r)) for t in range(1, k)], "t int, b long"
    )
    hits = (
        cum.join(
            F.broadcast(bdf),
            (F.col("__cum") >= F.col("b"))
            & (F.col("__cum") - F.col("__c") < F.col("b")),
        )
        .select(
            "t",
            value_col,
            "__c",
            (F.col("b") - (F.col("__cum") - F.col("__c"))).alias("__j"),
        )
        .collect()
    )
    assert len(hits) == k - 1, f"boundary probe found {len(hits)} of {k - 1}"
    # Boundaries strictly inside a tie block need the j-th smallest
    # tiebreak of that block. Batch ALL such probes into ONE job: a
    # window partitioned BY VALUE (parallel across blocks, never a
    # SinglePartition exchange) over only the probe blocks' rows. If a
    # single tie block ever outgrows one task (a pathological value
    # holding a constant fraction of the corpus), swap the window for a
    # per-block `global_row_ranks` pass — same answer, three jobs per
    # block instead of one total.
    need = {}
    for row in hits:
        v_t, c, j = row[value_col], int(row["__c"]), int(row["__j"])
        if 0 < j < c:
            need[(v_t, j)] = None
    thresholds: dict[tuple, object] = {}
    if need:
        probes = spark.createDataFrame(
            [(v, j) for v, j in need],
            f"__pv {df.schema[value_col].dataType.simpleString()}, __pj long",
        )
        wblk = Window.partitionBy(value_col).orderBy(F.col(tiebreak_col).asc())
        blocks = df.filter(
            F.col(value_col).isin([v for v, _ in need])
        ).select(value_col, tiebreak_col)
        found = (
            blocks.withColumn("__r", F.row_number().over(wblk))
            .join(
                F.broadcast(probes),
                (F.col(value_col) == F.col("__pv"))
                & (F.col("__r") == F.col("__pj")),
            )
            .select("__pv", "__pj", tiebreak_col)
            .collect()
        )
        thresholds = {(r["__pv"], r["__pj"]): r[tiebreak_col] for r in found}
        assert len(thresholds) == len(need), "tie-block probe lost a boundary"
    frontiers = []
    for row in sorted(hits, key=lambda r: r["t"]):
        v_t, c, j = row[value_col], int(row["__c"]), int(row["__j"])
        if j >= c:
            # boundary at the END of the tie block: every v_t row is
            # at-or-before it, so the value comparison alone decides
            frontiers.append((v_t, None))
        else:
            frontiers.append((v_t, thresholds[(v_t, j)]))
    return n, frontiers


def ntile_score_expr(
    value_col: str, asc: bool, tiebreak_col: str, frontiers: list[tuple]
) -> Column:
    """The exact ntile bucket of a row given its axis's frontiers:
    1 + the number of frontiers the row sorts strictly AFTER. Pure
    scan-stage comparisons against broadcast literals — no shuffle, no
    window, no rank."""
    expr = F.lit(1).cast("long")
    for v_t, ck in frontiers:
        beyond_val = (
            F.col(value_col) > F.lit(v_t)
            if asc
            else F.col(value_col) < F.lit(v_t)
        )
        if ck is None:
            after = beyond_val
        else:
            after = beyond_val | (
                (F.col(value_col) == F.lit(v_t))
                & (F.col(tiebreak_col) > F.lit(ck))
            )
        expr = expr + F.when(after, 1).otherwise(0)
    return expr.cast("long")


def ntile_from_rank(rank_col: str, n: int, k: int) -> Column:
    """The exact ``ntile(k)`` bucket of global rank ``rank_col`` over
    ``n`` rows, in closed form: with ``q, r = divmod(n, k)`` the first
    ``r`` buckets hold ``q + 1`` rows and the rest hold ``q`` (the ANSI
    contract; Spark and DuckDB agree). Pure integer expression — ``div``
    truncation equals floor because every operand is non-negative.
    """
    if n < 0 or k <= 0:
        raise ValueError(f"ntile_from_rank needs n >= 0, k >= 1; got {n}, {k}")
    q, r = divmod(n, k)
    if q == 0:
        # n < k: each row is its own bucket
        return F.col(rank_col).cast("long")
    cut = r * (q + 1)  # last rank inside the fat buckets
    return (
        F.when(
            F.col(rank_col) <= F.lit(cut),
            F.expr(f"({rank_col} - 1) div {q + 1}") + F.lit(1),
        )
        .otherwise(
            F.expr(f"({rank_col} - 1 - {cut}) div {q}") + F.lit(r + 1)
        )
        .cast("long")
    )
