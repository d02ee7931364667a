"""Property-based as-of join verification: for ARBITRARY small
timelines, asof_join must agree with the obvious quadratic Python
reference (for each left row: the max right ts <= left ts per key)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distgrep_spark.operators.asof import asof_join

BASE = datetime(2024, 1, 1)

# (key, offset-seconds) pairs; small domains force collisions and ties
_LEFT = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=1, max_size=8
)
_RIGHT = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20)), max_size=8
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_LEFT, right=_RIGHT)
def test_asof_matches_quadratic_reference(spark, left, right):
    # dedupe right per (key, ts) as the operator contract requires
    right_u = {(k, s) for k, s in right}
    l_rows = [
        (i, k, BASE + timedelta(seconds=s)) for i, (k, s) in enumerate(left)
    ]
    r_rows = [
        (k, BASE + timedelta(seconds=s), float(s)) for k, s in sorted(right_u)
    ]
    ldf = spark.createDataFrame(l_rows, "id long, key long, t timestamp")
    rdf = (
        spark.createDataFrame(r_rows, "key long, rt timestamp, val double")
        if r_rows
        else spark.createDataFrame([], "key long, rt timestamp, val double")
    )
    got = {
        r["id"]: (r["rt"], r["val"])
        for r in asof_join(
            ldf, rdf, on=["key"], left_ts="t", right_ts="rt", payload=["val"]
        ).collect()
    }
    for i, (k, s) in enumerate(left):
        cands = [rs for rk, rs in right_u if rk == k and rs <= s]
        if cands:
            best = max(cands)
            assert got[i] == (BASE + timedelta(seconds=best), float(best)), (i, k, s)
        else:
            assert got[i] == (None, None), (i, k, s)
    assert set(got) == set(range(len(left)))


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_LEFT, right=_RIGHT)
def test_asof_forward_matches_quadratic_reference(spark, left, right):
    right_u = {(k, s) for k, s in right}
    l_rows = [
        (i, k, BASE + timedelta(seconds=s)) for i, (k, s) in enumerate(left)
    ]
    r_rows = [
        (k, BASE + timedelta(seconds=s), float(s)) for k, s in sorted(right_u)
    ]
    ldf = spark.createDataFrame(l_rows, "id long, key long, t timestamp")
    rdf = (
        spark.createDataFrame(r_rows, "key long, rt timestamp, val double")
        if r_rows
        else spark.createDataFrame([], "key long, rt timestamp, val double")
    )
    got = {
        r["id"]: (r["rt"], r["val"])
        for r in asof_join(
            ldf,
            rdf,
            on=["key"],
            left_ts="t",
            right_ts="rt",
            payload=["val"],
            direction="forward",
        ).collect()
    }
    for i, (k, s) in enumerate(left):
        cands = [rs for rk, rs in right_u if rk == k and rs >= s]
        if cands:
            best = min(cands)  # earliest at-or-after, inclusive
            assert got[i] == (BASE + timedelta(seconds=best), float(best)), (i, k, s)
        else:
            assert got[i] == (None, None), (i, k, s)
    assert set(got) == set(range(len(left)))


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_LEFT, right=_RIGHT)
def test_asof_nearest_matches_quadratic_reference(spark, left, right):
    right_u = {(k, s) for k, s in right}
    l_rows = [
        (i, k, BASE + timedelta(seconds=s)) for i, (k, s) in enumerate(left)
    ]
    r_rows = [
        (k, BASE + timedelta(seconds=s), float(s)) for k, s in sorted(right_u)
    ]
    ldf = spark.createDataFrame(l_rows, "id long, key long, t timestamp")
    rdf = (
        spark.createDataFrame(r_rows, "key long, rt timestamp, val double")
        if r_rows
        else spark.createDataFrame([], "key long, rt timestamp, val double")
    )
    got = {
        r["id"]: (r["rt"], r["val"])
        for r in asof_join(
            ldf,
            rdf,
            on=["key"],
            left_ts="t",
            right_ts="rt",
            payload=["val"],
            direction="nearest",
        ).collect()
    }
    for i, (k, s) in enumerate(left):
        cands = [rs for rk, rs in right_u if rk == k]
        if cands:
            # nearest by |distance|, ties to the earlier (backward) side
            best = min(cands, key=lambda rs: (abs(rs - s), rs))
            assert got[i] == (BASE + timedelta(seconds=best), float(best)), (i, k, s)
        else:
            assert got[i] == (None, None), (i, k, s)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_LEFT, right=_RIGHT, tol=st.integers(0, 12))
def test_asof_tolerance_matches_masked_reference(spark, left, right, tol):
    """tolerance_seconds must equal the plain backward as-of with every
    match whose gap exceeds the bound nulled out — pandas merge_asof
    semantics, including the boundary (gap == tol is KEPT)."""
    right_u = {(k, s) for k, s in right}
    l_rows = [
        (i, k, BASE + timedelta(seconds=s)) for i, (k, s) in enumerate(left)
    ]
    r_rows = [
        (k, BASE + timedelta(seconds=s), float(s)) for k, s in sorted(right_u)
    ]
    ldf = spark.createDataFrame(l_rows, "id long, key long, t timestamp")
    rdf = (
        spark.createDataFrame(r_rows, "key long, rt timestamp, val double")
        if r_rows
        else spark.createDataFrame([], "key long, rt timestamp, val double")
    )
    got = {
        r["id"]: (r["rt"], r["val"])
        for r in asof_join(
            ldf,
            rdf,
            on=["key"],
            left_ts="t",
            right_ts="rt",
            payload=["val"],
            tolerance_seconds=tol,
        ).collect()
    }
    for i, (k, s) in enumerate(left):
        cands = [rs for rk, rs in right_u if rk == k and rs <= s]
        want = (None, None)
        if cands:
            best = max(cands)
            if s - best <= tol:
                want = (BASE + timedelta(seconds=best), float(best))
        assert got[i] == want, (i, k, s, tol, got[i], want)
