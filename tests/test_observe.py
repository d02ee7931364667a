"""df.observe(): accumulator-style metrics collected DURING a job — row
counts and sums come back with the action, no second scan. At 100 TB a
separate count() for monitoring doubles the read; observe() is free."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F


def test_observe_collects_metrics_in_one_pass(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    obs = Observation("scan_metrics")
    out = (
        li.observe(
            obs,
            F.count(F.lit(1)).alias("rows_scanned"),
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("qty_total"),
        )
        .where(F.col("l_linenumber") == 1)
        .groupBy("l_returnflag")
        .count()
    )
    n_groups = out.count()  # one action drives both query and metrics
    assert n_groups >= 1
    assert obs.get["rows_scanned"] == li.count()
    assert float(obs.get["qty_total"]) > 0
