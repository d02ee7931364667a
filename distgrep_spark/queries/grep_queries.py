"""Grep-family queries over the ``documents`` fixture.

The ``documents.text`` column stands in for the reference's newline-split
file (FIXTURES.md §1): one row per "line". Each query is the reference's
semantics (or its regex/case superset) with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distgrep_spark.operators.grep import distgrep, grep_lines
from distgrep_spark.queries.registry import query
from distgrep_spark.sources.catalog import load_table

# Probe patterns chosen from the fixture vocabulary (TESTDATA.md): "spark"
# hits a subset of rows; "Spark" tests case sensitivity (vocab is
# lowercase, so the case-sensitive variant differs from insensitive).
PROBE = "spark"


@query(
    "grep_contains",
    oracle=f"""
    SELECT text AS line, count(*) AS freq
    FROM documents
    WHERE contains(text, '{PROBE}')
    GROUP BY text
    """,
)
def grep_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's one query (worker.go:33-37 semantics) on documents."""
    return distgrep(load_table(spark, sf_dir, "documents"), PROBE, column="text")


@query(
    "grep_regex",
    oracle=r"""
    SELECT text AS line, count(*) AS freq
    FROM documents
    WHERE regexp_matches(text, 'sp[a-z]+k\s+join')
    GROUP BY text
    """,
)
def grep_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex superset (the reference README.md:6 assignment gap)."""
    return distgrep(
        load_table(spark, sf_dir, "documents"),
        r"sp[a-z]+k\s+join",
        column="text",
        mode="regex",
    )


@query(
    "grep_case_insensitive",
    oracle=f"""
    SELECT text AS line, count(*) AS freq
    FROM documents
    WHERE contains(lower(text), '{PROBE}')
    GROUP BY text
    """,
)
def grep_case_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive contains (reference is case-sensitive-only)."""
    return distgrep(
        load_table(spark, sf_dir, "documents"), PROBE.upper(), column="text", case_sensitive=False
    )


@query(
    "grep_filter_only",
    oracle=f"""
    SELECT doc_id, text
    FROM documents
    WHERE contains(text, '{PROBE}')
    """,
)
def grep_filter_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain grep (filter, no aggregation): one narrow stage, no shuffle;
    predicate + column pruning reach the parquet scan."""
    return grep_lines(load_table(spark, sf_dir, "documents"), PROBE, column="text").select(
        "doc_id", "text"
    )


@query(
    "grep_zero_matches",
    oracle="""
    SELECT text AS line, count(*) AS freq
    FROM documents
    WHERE contains(text, 'xyzzy-no-such-substring')
    GROUP BY text
    """,
)
def grep_zero_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-match path (reference server.go:181-183 short-circuit):
    empty DataFrames propagate for free in Spark."""
    return distgrep(load_table(spark, sf_dir, "documents"), "xyzzy-no-such-substring", column="text")


@query(
    "grep_by_lang",
    oracle=f"""
    SELECT lang, count(*) AS matched_docs,
           round(avg(n_chars), 2) AS avg_chars
    FROM documents
    WHERE contains(text, '{PROBE}')
    GROUP BY lang
    """,
)
def grep_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grep + grouped rollup by metadata column — the first step away from
    the reference's single-column world."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.where(F.col("text").contains(PROBE))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("matched_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )
