"""Central query registry.

Every operator implemented from SURVEY.md §2 registers here as a named
query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an equivalent ANSI-SQL string the DuckDB
oracle runs on the same parquet tables. ``__spark_entry__.py`` simply
re-exports this registry.

Column-name parity contract: the Spark DataFrame and the oracle SQL must
produce identical column names (the driver sorts columns by name before
hashing). Helpers here do not enforce it; tests/test_oracle_parity.py does.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: add a query to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags, bench=bench)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query-defining module, then return the registry."""
    # Imports are side-effectful (decorators fill REGISTRY).
    from .operators import (  # noqa: F401
        asof,
        curation,
        decision_support,
        dedup,
        merge,
        relational,
        setops,
        similarity,
        textpipe,
        topk,
    )
    from .functions import arrays, text  # noqa: F401
    from .sources import binary, formats, lake  # noqa: F401
    from .streaming import events  # noqa: F401
    from .ml import cnn as ml_cnn  # noqa: F401
    from .ml import distributed as ml_distributed  # noqa: F401
    from .ml import queries as ml_queries  # noqa: F401

    return REGISTRY
