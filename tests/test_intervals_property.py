"""Property-based interval-operator verification: for ARBITRARY small
interval sets (including touching, nested, identical, and zero-length
intervals), interval_union and peak_concurrency must agree with the
obvious per-key Python sweep references."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distgrep_spark.operators.intervals import interval_union, peak_concurrency

# (key, start, length) with tiny domains to force ties, containment,
# adjacency, and zero-length intervals
_IVS = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20), st.integers(0, 8)),
    min_size=1,
    max_size=10,
)


def _rows(ivs):
    return [
        (i, k, s, s + ln) for i, (k, s, ln) in enumerate(ivs)
    ]  # id doubles as the tie column


def _union_ref(rows):
    by = {}
    for _, k, s, e in rows:
        by.setdefault(k, []).append((s, e))
    out = {}
    for k, vs in by.items():
        vs.sort()
        islands, covered, cur_end = 0, 0, None
        for s, e in vs:
            if cur_end is None or s > cur_end:
                islands += 1
                covered += e - s
                cur_end = e
            elif e > cur_end:
                covered += e - cur_end
                cur_end = e
        out[k] = (islands, covered)
    return out


def _peak_ref(rows):
    by = {}
    for _, k, s, e in rows:
        by.setdefault(k, []).append((s, e))
    out = {}
    for k, vs in by.items():
        deltas = sorted(
            [(s, 1) for s, _ in vs] + [(e, -1) for _, e in vs],
            key=lambda x: (x[0], x[1]),
        )
        run, peak = 0, 0
        for _, d in deltas:
            run += d
            peak = max(peak, run)
        out[k] = (peak, len(vs))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ivs=_IVS)
def test_interval_union_matches_sweep_reference(spark, ivs):
    rows = _rows(ivs)
    df = spark.createDataFrame(rows, "event_id long, user_id long, s long, e long")
    got = {
        r["user_id"]: (r["n_islands"], r["covered"])
        for r in interval_union(df).collect()
    }
    assert got == _union_ref(rows)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ivs=_IVS)
def test_peak_concurrency_matches_sweep_reference(spark, ivs):
    rows = _rows(ivs)
    df = spark.createDataFrame(rows, "event_id long, user_id long, s long, e long")
    got = {
        r["user_id"]: (r["peak_concurrency"], r["n_intervals"])
        for r in peak_concurrency(df).collect()
    }
    assert got == _peak_ref(rows)
