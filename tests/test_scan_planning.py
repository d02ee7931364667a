"""Input-split planning — the Spark replacement for the reference's
computeSlices block partitioner (server.go:95-124, SURVEY §2.1 op #3):
split count follows spark.sql.files.maxPartitionBytes, not a hand-coded
ceil(N/W), and fewer-rows-than-partitions is fine (the reference had to
special-case surplus workers via its `stop` flag)."""

from __future__ import annotations


def test_max_partition_bytes_drives_split_count(spark):
    path = "/root/testdata/sf0.1/lineitem.parquet"
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        coarse = spark.read.parquet(path).rdd.getNumPartitions()
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(512 * 1024))
        fine = spark.read.parquet(path).rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert fine > coarse, (coarse, fine)


def test_fewer_rows_than_partitions_is_fine(spark):
    """Reference needed a `stop` flag to drop surplus workers
    (server.go:107-115); Spark just schedules empty partitions."""
    df = spark.createDataFrame([(1,), (2,)], "x int").repartition(16)
    assert df.rdd.getNumPartitions() == 16
    assert df.count() == 2
