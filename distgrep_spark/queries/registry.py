"""Registry plumbing for driver-checked queries.

Contract (``__spark_entry__.py``): the driver runs each registered Spark
callable at sf0.01 AND the paired DuckDB SQL, then compares row count +
schema + order-insensitive value hash. Column names must match exactly on
both sides, so every computed column is aliased identically in the Spark
code and the SQL.

Queries whose semantics are not ANSI-SQL-expressible (LSH, streaming
state) register with ``oracle=None`` → the driver records a weaker
rows-only check; deterministic pytest oracles cover them instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query (and its DuckDB oracle SQL, if any)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
