"""Registry contract sanity: the driver-facing surface stays coherent
as queries accumulate."""

from __future__ import annotations

import re

import distgrep_spark.queries as q
import __spark_entry__ as entry


def test_every_oracle_has_a_query():
    assert set(q.ORACLES) <= set(q.QUERIES)


def test_names_are_snake_case():
    assert all(re.fullmatch(r"[a-z0-9_]+", n) for n in q.QUERIES)


def test_entry_module_mirrors_registry():
    assert entry.queries().keys() == q.QUERIES.keys()
    assert entry.oracle_sql().keys() == q.ORACLES.keys()


def test_scoreboard_prefix_is_first_and_complete():
    """The driver scores a ~50-query prefix of queries() in dict order;
    the curated SCOREBOARD_PREFIX must actually BE that prefix, contain
    no unknown names, and keep at most one rows-only entry (everything
    else in the scored window must be hash-checkable)."""
    names = list(entry.queries())
    pref = entry.SCOREBOARD_PREFIX
    assert len(pref) == 50
    assert names[: len(pref)] == pref
    rows_only_in_prefix = [n for n in pref if n not in q.ORACLES]
    assert rows_only_in_prefix == ["kmeans_clusters"]
    # oracle dict must lead with the same ordering (minus rows-only)
    assert list(entry.oracle_sql())[:10] == [n for n in pref if n in q.ORACLES][:10]


def test_rows_only_queries_are_documented_exceptions():
    """Every oracle-less query must be a sketch/iterative/UDF path — the
    kinds the driver contract exempts — listed here EXPLICITLY so adding
    an undocumented rows-only query fails review."""
    expected_rows_only = {
        "agg_approx_distinct",      # HLL estimates are engine-specific
        "dedup_minhash_lsh",        # xxhash64 sketch
        "dedup_simhash",            # xxhash64 sketch
        "sim_ann_lsh",              # engine-side hyperplane buckets
        "sim_ann_ivf",              # engine-side centroid buckets
        "kmeans_clusters",          # iterative, float-order dependent
        "text_fingerprints",        # xxhash64 rolling hash
        "multimodal_byte_features", # Pandas-UDF path, pytest-checked
        "sim_cosine_topk_pandas",   # BLAS scorer differs from HOF in last ulp
    }
    assert set(q.QUERIES) - set(q.ORACLES) == expected_rows_only
