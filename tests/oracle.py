"""Local re-implementation of the driver's DuckDB-oracle comparison:
row count + column names + order-insensitive value hash. Used by
tests/test_oracle_parity.py so mismatches surface before the driver runs.
"""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0 (equal numerically, formats differently)
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)


# Output types the driver's pandas-based hasher cannot normalize portably:
# DuckDB HUGEINT round-trips through float64 (mismatching Spark's BIGINT)
# and list/struct/map cells are unhashable.  Round-1 lost 5 driver rows to
# this class; every oracle must emit only scalar, exactly-representable
# types.
_DRIVER_HOSTILE = ("HUGEINT", "UHUGEINT", "[]", "STRUCT", "MAP", "UNION")


def hostile_oracle_columns(con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Columns of the oracle's output whose DuckDB type the driver's hasher
    mangles (HUGEINT via float64) or rejects (lists/structs/maps)."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    return [
        f"{name}: {ctype}"
        for name, ctype, *_ in desc
        if any(h in ctype.upper() for h in _DRIVER_HOSTILE)
    ]


def hostile_spark_columns(spark_df) -> list[str]:
    """Spark output columns with non-scalar types (same driver constraint)."""
    return [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in spark_df.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]


# The driver's pandas hasher is type-sensitive: an integral 1 and a
# floating 1.0 hash differently even though they compare equal numerically
# (and even though _norm_cell above renders both as "1").  Round 3 lost its
# only driver row to this class — events_retention_cohorts' oracle used
# DuckDB `/` (float division → DOUBLE) where Spark emitted BIGINT.  Gate it
# the same way HUGEINT was gated in round 2: any column where one engine is
# integral and the other floating is driver-hostile.
_DUCK_INTEGRAL = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT",
}
_DUCK_FLOATING = {"FLOAT", "REAL", "DOUBLE"}
_SPARK_INTEGRAL = {"byte", "short", "integer", "long"}
_SPARK_FLOATING = {"float", "double"}


def int_float_mismatches(
    spark_df, con: duckdb.DuckDBPyConnection, sql: str
) -> list[str]:
    """Columns where one engine emits an integral type and the other a
    floating type — hash-poison for the driver regardless of values."""
    desc = {
        name: ctype.upper().split("(")[0].strip()
        for name, ctype, *_ in con.execute(f"DESCRIBE {sql}").fetchall()
    }
    out = []
    for f in spark_df.schema.fields:
        d = desc.get(f.name)
        if d is None:
            continue
        s = f.dataType.typeName()
        if (s in _SPARK_INTEGRAL and d in _DUCK_FLOATING) or (
            s in _SPARK_FLOATING and d in _DUCK_INTEGRAL
        ):
            out.append(f"{f.name}: spark={s} duck={d}")
    return out


def driver_canon_rows(spark_df) -> int:
    """Row count after the driver-identical canonicalization of a rows-only
    query's output: ``toPandas()``, then ``sort_values`` across every
    column, then a pandas value hash.

    The driver applies this exact path to EVERY registered query (not just
    oracle-bearing ones) before recording rows>0; Python ``list`` / ``dict``
    / ``DenseVector`` cells crash it (``TypeError: unhashable type``) — the
    class that produced round 4's three ERR rows.  Rows-only rehearsals
    must assert through this function, never bare ``count()``.
    """
    import pandas as pd

    pdf = spark_df.toPandas()
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
        pd.util.hash_pandas_object(pdf, index=False)
    return len(pdf)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    bad = (
        hostile_spark_columns(spark_df)
        + hostile_oracle_columns(con, sql)
        + int_float_mismatches(spark_df, con, sql)
    )
    if bad:
        return False, f"driver-hostile output types: {bad}"
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    a = canonical_rows(s_cols, s_rows)
    b = canonical_rows(d_cols, d_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch; first diffs: {diffs}"
    return True, "ok"
