"""Empty-input robustness for the driver-scored surface.

The reference short-circuits empty inputs explicitly (server.go:154,
181, 196 — SURVEY.md §2.1 op #11). Our queries must degrade the same
way: an empty fixture directory yields an empty (or
empty-cohort-shaped) result, never an ANSI arithmetic error, a
divide-by-zero, or a driver-side IndexError from a collect of nothing.
This runs every SCOREBOARD_PREFIX query — the exact surface the driver
scores — against schema-identical empty tables.
"""

from __future__ import annotations

import pytest

import distgrep_spark.queries as q
from __spark_entry__ import SCOREBOARD_PREFIX
from distgrep_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        load_table(spark, SF_SMALL, t).limit(0).write.mode("overwrite").parquet(
            str(root / f"{t}.parquet")
        )
    return str(root)


@pytest.mark.parametrize("name", SCOREBOARD_PREFIX)
def test_scored_query_survives_empty_input(spark, empty_sf, name):
    # Measured: every prefix query — including the bounded-seed
    # centroid/codebook pullers — degrades to an empty result with its
    # schema intact; none hits an ANSI error or a driver IndexError.
    df = q.QUERIES[name](spark, empty_sf)
    assert df.count() >= 0  # executes without error; schema stays intact
    assert len(df.schema) > 0


def test_full_registry_survives_empty_input(spark, empty_sf):
    """Beyond the scored prefix: every registered query must degrade on
    empty fixtures (one loop — per-query parametrize would double the
    suite's session count). kmeans_clusters used to IndexError pulling
    seed centroids from an empty collect; operators/clustering.py now
    returns the schema-stable empty result instead."""
    rest = [n for n in q.QUERIES if n not in set(SCOREBOARD_PREFIX)]
    failures = []
    for name in rest:
        try:
            df = q.QUERIES[name](spark, empty_sf)
            assert df.count() >= 0
            assert len(df.schema) > 0
        except Exception as e:  # noqa: BLE001 - collecting a report
            failures.append((name, str(e).splitlines()[0][:80]))
    assert not failures, failures


@pytest.fixture(scope="module")
def single_row_sf(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("single_sf")
    for t in TABLES:
        load_table(spark, SF_SMALL, t).limit(1).write.mode("overwrite").parquet(
            str(root / f"{t}.parquet")
        )
    return str(root)


def test_scored_prefix_survives_single_row_input(spark, single_row_sf):
    """Degenerate one-row tables: the ANSI divide-by-zero hazard class
    (variance with n=1, OLS on one point, shares of a zero total).
    Measured: every scored query degrades (the FK joins mostly empty
    out; the single-group aggregates guard their denominators)."""
    failures = []
    for name in SCOREBOARD_PREFIX:
        try:
            df = q.QUERIES[name](spark, single_row_sf)
            assert df.count() >= 0
        except Exception as e:  # noqa: BLE001 - collecting a report
            failures.append((name, str(e).splitlines()[0][:80]))
    assert not failures, failures
