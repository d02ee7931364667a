"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``distgrep_spark.queries`` and self-register via the
``@query`` decorator; this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import distgrep_spark.queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's distgrep (filter-contains →
    groupBy(line).count(); SURVEY.md §0) over documents at sf0.001."""
    return q.QUERIES["grep_contains"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; keys missing here (LSH, streaming
    state) get the driver's weaker rows-only check by design."""
    return dict(q.ORACLES)
