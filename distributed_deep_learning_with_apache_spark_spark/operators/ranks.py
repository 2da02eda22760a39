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

Fault tolerance (the 100 TB deployment note): the partition-id pin is
an eager ``localCheckpoint``, which stores blocks on executors WITHOUT
lineage — on a real cluster, losing an executor after the checkpoint
invalidates its blocks and FAILS THE JOB LOUDLY (it can never produce a
silently wrong rank, because both consumers read the same materialized
blocks or none). The recovery story is job restart, the same contract
as any non-replicated cache; a deployment that needs to survive
executor loss mid-query swaps ``localCheckpoint`` for a reliable
``checkpoint`` (HDFS-backed) at the cost of one distributed write.

Null contract: the order/value columns must be NON-NULL. SQL engines
disagree on NULL placement (NULLS FIRST vs LAST defaults differ), and a
NULL value collapses the frontier comparisons (`ntile_score_expr`'s
``>``/``=`` yield NULL → tile 1 regardless of direction), so
``ntile_frontiers`` raises on any NULL in ``value_col`` — detected for
free inside the per-value stats aggregate. Callers null-filter or
coalesce first (tokens() is null-safe; the RFM axes are
aggregate-derived, never NULL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

RANK_PARTS = 32

# A tie block whose row count exceeds this routes through a per-block
# `global_row_ranks` pass (three small distributed jobs) instead of the
# batched single-window probe: the window partitions BY VALUE, so one
# pathological value holding a constant fraction of the corpus would
# serialize its probe into one task. 4M (value, tiebreak) pairs ≈ 64 MB
# — comfortably one task; anything bigger is the skew case the r10
# docstring promised to fall back on (now automatic, r11).
TIE_BLOCK_TASK_ROWS = 4_000_000

# Test observability: count of tie blocks routed through the fallback
# since process start (tests force a tiny threshold and assert > 0).
_fallback_block_probes = 0


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

    Order columns should be NON-NULL (callers' contract): Spark's range
    partitioner and row_number place NULLs consistently with each other,
    but cross-engine NULL ordering differs — see the module docstring.
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
    tie_block_task_rows: int | None = None,
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

    ``value_col`` must be NON-NULL (raises ValueError otherwise — see
    the module docstring); ``tiebreak_col`` must be unique per value so
    the order is total. Tie blocks larger than ``tie_block_task_rows``
    are probed with a per-block ``global_row_ranks`` pass instead of
    the shared by-value window (automatic skew fallback, r11).
    """
    global _fallback_block_probes
    if k <= 0:
        raise ValueError(f"ntile_frontiers needs k >= 1; got {k}")
    if tie_block_task_rows is None:
        # resolved at CALL time so tests (and deployments) can retune the
        # module constant and see it through the registered query paths
        tie_block_task_rows = TIE_BLOCK_TASK_ROWS
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
        pv.groupBy("__pid")
        .agg(
            F.sum("__c").cast("long").alias("pc"),
            # NULL detection rides the same aggregate — zero extra jobs
            F.sum(
                F.when(F.col(value_col).isNull(), F.col("__c")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("nullc"),
        )
        .collect()
    )
    n_null = sum(int(r["nullc"]) for r in stats)
    if n_null:
        raise ValueError(
            f"ntile_frontiers: {value_col} holds {n_null} NULL row(s); the "
            "frontier comparisons cannot order NULLs — filter or coalesce "
            "them first (module docstring: null contract)"
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
    if len(hits) != k - 1:
        # explicit raise, not assert: python -O must not strip this gate
        # (a short probe would silently mis-tile every row downstream)
        raise RuntimeError(
            f"ntile_frontiers boundary probe found {len(hits)} of {k - 1}"
        )
    # Boundaries strictly inside a tie block need the j-th smallest
    # tiebreak of that block. Small blocks batch into ONE job: a window
    # partitioned BY VALUE (parallel across blocks, never a
    # SinglePartition exchange) over only the probe blocks' rows. A tie
    # block larger than `tie_block_task_rows` (a pathological value
    # holding a constant fraction of the corpus would serialize its one
    # probe window into one task) routes through a per-block
    # `global_row_ranks` pass instead — same answer, three small
    # distributed jobs for that block (automatic skew fallback, r11).
    need = {}
    thresholds: dict[tuple, object] = {}
    for row in hits:
        v_t, c, j = row[value_col], int(row["__c"]), int(row["__j"])
        if not 0 < j < c:
            continue
        if c > tie_block_task_rows:
            _fallback_block_probes += 1
            block = df.filter(F.col(value_col) == F.lit(v_t)).select(
                value_col, tiebreak_col
            )
            ranked, n_blk = global_row_ranks(
                spark, block, [(tiebreak_col, True)], rank_col="__r",
                num_parts=num_parts,
            )
            if n_blk != c:
                raise RuntimeError(
                    f"ntile_frontiers fallback: tie block {v_t!r} ranked "
                    f"{n_blk} rows, per-value count said {c}"
                )
            got = ranked.filter(F.col("__r") == j).select(tiebreak_col).collect()
            if len(got) != 1:
                raise RuntimeError(
                    f"ntile_frontiers fallback probe for block {v_t!r} rank "
                    f"{j} returned {len(got)} rows"
                )
            thresholds[(v_t, j)] = got[0][tiebreak_col]
        else:
            need[(v_t, j)] = None
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
        thresholds.update(
            {(r["__pv"], r["__pj"]): r[tiebreak_col] for r in found}
        )
        if len(found) != len(need):
            # explicit raise, not assert: python -O must not strip this
            raise RuntimeError(
                f"ntile_frontiers tie-block probe lost a boundary: "
                f"{len(found)} of {len(need)} resolved"
            )
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
    window, no rank. ``value_col`` must be NON-NULL (a NULL collapses
    every comparison to NULL → tile 1 regardless of direction;
    ``ntile_frontiers`` raises before frontiers for such data exist)."""
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
