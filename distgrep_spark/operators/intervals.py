"""Interval algebra over (key, start, end) rows — overlap-merge
(union coverage) and sweep-line peak concurrency.

Neither is a single built-in op in Spark, but both reduce to the same
scalable composition: ONE hash exchange on the entity key, one
per-partition sort, window arithmetic, and a per-key rollup that rides
the window's partitioning. No self-join, no explode of the covered
range — the state per row is one running integer/BIGINT, which is why
the shape survives 100 TB per-entity timelines (ad-attribution windows,
on-call coverage, machine-utilization billing, max-concurrent-streams).

Semantics are half-open ``[start, end)`` in exact integer units
(callers convert timestamps via the tz-free ``timestampdiff``
MICROSECOND idiom — never fractional-seconds epochs, whose
double-vs-truncation behavior differs across engines; CLAUDE.md).

Determinism: ``interval_union`` orders by (start, tie), where ``tie``
is any total-order column (an event id); ``peak_concurrency`` orders by
(t, delta) so closes process before opens at the same instant, and tied
identical rows permute only INTERMEDIATE prefix sums, never the
multiset of prefix values, so the per-key max needs no further
tie-break.

No reference counterpart (the reference's only operator surface is
grep, worker.go:24-43); these extend the north-star analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_union(
    df: DataFrame,
    *,
    key: str = "user_id",
    start: str = "s",
    end: str = "e",
    tie: str = "event_id",
) -> DataFrame:
    """Merge overlapping ``[start, end)`` intervals per key; returns one
    row per key with ``n_islands`` (disjoint merged ranges) and
    ``covered`` (total union length, exact integer units).

    Novel-coverage clip: sorted by (start, tie) within key, each
    interval contributes ``max(0, end - max(start, prev_max_end))`` and
    opens an island iff it starts past the running ``max(end)`` over
    preceding rows — correct even when a long interval swallows later
    shorter ones (the case a lag-gap sessionizer gets wrong)."""
    w = (
        Window.partitionBy(key)
        .orderBy(start, tie)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pe = F.max(end).over(w)
    novel = F.when(pe.isNull(), F.col(end) - F.col(start)).otherwise(
        F.greatest(
            F.lit(0).cast("bigint"), F.col(end) - F.greatest(F.col(start), pe)
        )
    )
    island = F.when(pe.isNull() | (F.col(start) > pe), 1).otherwise(0)
    return (
        df.select(key, novel.alias("_novel"), island.alias("_isl"))
        .groupBy(key)
        .agg(
            F.sum("_isl").cast("bigint").alias("n_islands"),
            F.sum("_novel").cast("bigint").alias("covered"),
        )
    )


def peak_concurrency(
    df: DataFrame,
    *,
    key: str = "user_id",
    start: str = "s",
    end: str = "e",
) -> DataFrame:
    """Maximum number of simultaneously-open ``[start, end)`` intervals
    per key (the sweep line): +1 at each start, -1 at each end, running
    sum ordered by (t, delta) — closes before opens at equal instants,
    the half-open convention — then max per key. Returns one row per
    key with ``peak_concurrency`` and ``n_intervals``."""
    deltas = df.select(
        key, F.col(start).alias("_t"), F.lit(1).alias("_delta")
    ).unionByName(df.select(key, F.col(end).alias("_t"), F.lit(-1).alias("_delta")))
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = deltas.select(key, F.sum("_delta").over(w).alias("_conc"))
    return running.groupBy(key).agg(
        F.max("_conc").cast("bigint").alias("peak_concurrency"),
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_intervals"),
    )
