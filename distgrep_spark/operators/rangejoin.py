"""Banded range join: the scale path for theta joins.

A raw ``c.val > p.val`` join is a nested loop — |P|x|V| comparisons.
Banding splits the work into (a) whole buckets strictly above the
probe's bucket, pre-aggregated to one count per bucket, and (b) a
same-bucket residual compared row-by-row. Comparisons drop from
|P| x |V| to |P| x (#buckets + avg bucket population):

    buckets  = floor(val / width)          -- map-side
    above    = probes x bucket_counts      -- theta join, but on the
                                              TINY aggregated table
    residual = probes =bucket= values      -- equi join, strict compare

Same answer as the nested loop (the registry query shares join_range's
oracle verbatim); width trades the two terms off against each other.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def count_greater_join(
    probes: DataFrame,
    values: DataFrame,
    *,
    probe_col: str,
    value_col: str,
    keys: list[str],
    bucket_width: float,
) -> DataFrame:
    """For each probe row, count value rows with value strictly greater
    than the probe's. Returns ``keys + [n_greater]``, omitting probes
    with a zero count (inner-join semantics, matching the plain theta
    join + groupBy it replaces)."""
    vb = values.select(
        F.floor(F.col(value_col) / bucket_width).alias("_vb"),
        F.col(value_col).alias("_v"),
    )
    bucket_counts = vb.groupBy("_vb").agg(F.count(F.lit(1)).alias("_n"))

    p = probes.select(
        *keys,
        F.col(probe_col).alias("_p"),
        F.floor(F.col(probe_col) / bucket_width).alias("_pb"),
    )
    # (a) buckets strictly above the probe's: theta join against the
    # aggregated bucket table (rows = distinct buckets, not values)
    above = (
        p.join(broadcast(bucket_counts), F.col("_vb") > F.col("_pb"), "left")
        .groupBy(*keys)
        .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("_n_above"))
    )
    # (b) same-bucket residual: equi join, then the strict compare
    resid = (
        p.join(vb, F.col("_vb") == F.col("_pb"), "left")
        .groupBy(*keys)
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("_v") > F.col("_p"), 1).otherwise(0)), F.lit(0)
            ).alias("_n_resid")
        )
    )
    n_greater: Column = (F.col("_n_above") + F.col("_n_resid")).alias("n_greater")
    return (
        above.join(resid, keys)
        .select(*keys, n_greater)
        .where(F.col("n_greater") > 0)
    )
