"""Parquet schema evolution: additive columns across file generations.

The 100-TB reality: a table written over months gains columns; readers
must union the schemas (old files yield NULLs for new columns) and
pushdown must keep working on columns present in every generation.
The reference has a fixed protobuf schema (SURVEY.md §1.3) — this is
engine surface the reference never needed but any real user does.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def evolved_table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("evolve") / "t")
    v1 = spark.createDataFrame(
        [(1, "alpha", 10.0), (2, "beta", 20.0)],
        "id long, name string, score double",
    )
    v1.write.mode("append").parquet(root)
    v2 = spark.createDataFrame(
        [(3, "gamma", 30.0, "en"), (4, "delta", 40.0, "fr")],
        "id long, name string, score double, lang string",
    )
    v2.write.mode("append").parquet(root)
    return root


def test_merge_schema_unions_generations(spark, evolved_table):
    df = spark.read.option("mergeSchema", "true").parquet(evolved_table)
    assert set(df.columns) == {"id", "name", "score", "lang"}
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 4
    # old-generation files surface the new column as NULL
    assert rows[1]["lang"] is None and rows[2]["lang"] is None
    assert rows[3]["lang"] == "en" and rows[4]["lang"] == "fr"


def test_pushdown_survives_merged_schema(spark, evolved_table):
    df = (
        spark.read.option("mergeSchema", "true")
        .parquet(evolved_table)
        .where("id >= 3")
        .select("id", "lang")
    )
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "GreaterThanOrEqual(id,3)" in plan, "filter must reach the scan"
    assert {r["id"] for r in df.collect()} == {3, 4}


def test_new_column_filter_keeps_old_files_out(spark, evolved_table):
    df = (
        spark.read.option("mergeSchema", "true")
        .parquet(evolved_table)
        .where("lang = 'en'")
    )
    rows = df.collect()
    assert [r["id"] for r in rows] == [3]
    # NULL lang rows (old generation) must not match — three-valued logic
    df2 = (
        spark.read.option("mergeSchema", "true")
        .parquet(evolved_table)
        .where("lang IS NULL")
    )
    assert {r["id"] for r in df2.collect()} == {1, 2}
