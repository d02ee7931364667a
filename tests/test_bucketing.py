"""Bucketed co-located join: pre-partitioning both sides of a recurring
join by the join key removes the per-query shuffle entirely — at 100 TB
the difference between re-exchanging the fact table on every query and
reading it join-ready. The plan must show a join with NO Exchange on
either side."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    """Force a non-broadcast join so the Exchange question is real."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"bk_fact_{suffix}", f"bk_dim_{suffix}"
    fact = spark.range(0, 5000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    try:
        fact.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(ta)
        dim.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(tb)
        joined = spark.table(ta).join(spark.table(tb), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 5000

        # control: the same join on unbucketed data DOES exchange
        control = fact.join(dim, "k")
        cplan = control._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in cplan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")
