"""Custom Python DataSource (sources/synthetic.py): partition planning,
determinism across partitionings, and composition with the engine."""

from __future__ import annotations

import pytest

from distgrep_spark.operators.grep import distgrep
from distgrep_spark.sources.synthetic import SyntheticDocs


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SyntheticDocs)
    return spark


def load(spark, **opts):
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_partition_planning(registered):
    df = load(registered, n_docs=100, num_partitions=6)
    assert df.rdd.getNumPartitions() == 6
    assert df.count() == 100
    assert {r["doc_id"] for r in df.collect()} == set(range(100))


def test_deterministic_across_partitionings(registered):
    a = sorted(r["text"] for r in load(registered, n_docs=200, num_partitions=3).collect())
    b = sorted(r["text"] for r in load(registered, n_docs=200, num_partitions=9).collect())
    assert a == b


def test_seed_changes_content(registered):
    a = load(registered, n_docs=50, seed=1).collect()
    b = load(registered, n_docs=50, seed=2).collect()
    assert {r["text"] for r in a} != {r["text"] for r in b}


def test_composes_with_grep(registered):
    df = load(registered, n_docs=300)
    out = distgrep(df, "spark", column="text")
    assert out.columns == ["line", "freq"]
    assert out.count() > 0
