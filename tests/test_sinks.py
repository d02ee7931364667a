"""Sink parity (SURVEY.md §2.1 op #9): the reference emits freq\\tline
(server.go:229-235); our engine writes the same shape via the csv sink
with a tab separator, plus parquet/json roundtrips for the general case.
"""

from __future__ import annotations

from distgrep_spark.operators.grep import distgrep


def test_tsv_sink_roundtrip(spark, tmp_path):
    src = tmp_path / "in.txt"
    src.write_text("ba\nba\nxa\n")
    out = tmp_path / "out_tsv"
    df = distgrep(
        spark.read.text(str(src)), "a", column="value"
    ).select("freq", "line")
    df.write.option("sep", "\t").mode("overwrite").csv(str(out))
    back = (
        spark.read.option("sep", "\t")
        .schema("freq long, line string")
        .csv(str(out))
    )
    assert {(r["freq"], r["line"]) for r in back.collect()} == {(2, "ba"), (1, "xa")}


def test_parquet_sink_roundtrip(spark, tmp_path):
    out = tmp_path / "out_parquet"
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    df.write.mode("overwrite").parquet(str(out))
    back = spark.read.parquet(str(out))
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b")]


def test_json_sink_roundtrip(spark, tmp_path):
    out = tmp_path / "out_json"
    df = spark.createDataFrame([(1, [1.5, 2.5]), (2, [])], ["k", "vec"])
    df.write.mode("overwrite").json(str(out))
    back = spark.read.schema("k long, vec array<double>").json(str(out))
    assert {r["k"]: r["vec"] for r in back.collect()} == {1: [1.5, 2.5], 2: []}


def test_partitioned_parquet_sink_prunes(spark, tmp_path):
    """Hive-style partitioning: a filter on the partition column must
    prune directories, not scan-and-filter (partition pruning is how a
    100 TB table serves a one-partition query)."""
    out = tmp_path / "out_part"
    df = spark.createDataFrame(
        [(1, "en", "x"), (2, "de", "y"), (3, "en", "z")], ["id", "lang", "t"]
    )
    df.write.mode("overwrite").partitionBy("lang").parquet(str(out))
    back = spark.read.parquet(str(out)).where("lang = 'en'")
    assert back.count() == 2
    scan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in scan


def test_orc_sink_roundtrip(spark, tmp_path):
    """ORC completes the built-in columnar-format matrix (parquet is the
    house format; ORC interops with Hive-era lakes). Types that have
    bitten elsewhere — timestamp, array, double — must survive the
    roundtrip exactly."""
    from pyspark.sql import functions as F

    out = tmp_path / "out_orc"
    df = spark.createDataFrame(
        [(1, "a", 1.5, ["x", "y"]), (2, "b", -0.25, [])],
        "k long, v string, score double, tags array<string>",
    ).withColumn("ts", F.to_timestamp(F.lit("2024-03-01 12:00:00")))
    df.write.mode("overwrite").orc(str(out))
    back = spark.read.orc(str(out))
    assert back.schema == df.schema
    key = lambda r: r["k"]  # noqa: E731
    assert sorted(back.collect(), key=key) == sorted(df.collect(), key=key)


def test_managed_table_save_insert_roundtrip(spark, tmp_path):
    """saveAsTable / spark.table / insertInto: the catalog surface a
    warehouse user expects on top of raw paths — create a managed
    table, append via insertInto, read back through the catalog, drop.
    (Position-based insertInto vs by-name saveAsTable append is a
    classic silent-corruption trap; the assert pins the round trip.)"""
    name = "t_managed_roundtrip"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    df.write.saveAsTable(name)
    try:
        spark.createDataFrame([(3, "c")], "k long, v string").write.insertInto(name)
        back = spark.table(name)
        assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b"), (3, "c")}
        assert name in [t.name for t in spark.catalog.listTables()]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
