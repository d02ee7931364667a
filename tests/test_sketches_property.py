"""Property tests for the count-min operators: for ARBITRARY key
multisets (skewed, tiny, colliding), the estimate must never
undercount, must be exact when no collision occurs, and must be
invariant between the per-row and pre-aggregated build paths."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distgrep_spark.operators.sketches import countmin_build, countmin_probe

_KEYS = st.lists(st.integers(0, 30), min_size=1, max_size=60)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(keys=_KEYS)
def test_countmin_never_undercounts_and_builds_agree(spark, keys):
    exact = Counter(keys)
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    # tiny w forces collisions so the overcount branch is exercised
    cms_rows = countmin_build(df, key="k", d=3, w=8)
    rollup = df.groupBy("k").count()
    cms_agg = countmin_build(rollup, key="k", weight="count", d=3, w=8)
    # additivity: per-row and pre-aggregated builds are the same sketch
    assert {tuple(r) for r in cms_rows.collect()} == {
        tuple(r) for r in cms_agg.collect()
    }
    probe = spark.createDataFrame([(k,) for k in exact], "k long")
    est = {
        r["k"]: r["est_n"]
        for r in countmin_probe(cms_rows, probe, key="k", d=3, w=8).collect()
    }
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)  # CMS theorem: no undercount
    # total mass bound: no estimate can exceed the full input size
    assert all(v <= len(keys) for v in est.values())


def test_countmin_unseen_key_estimates_bounded(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    cms = countmin_build(df, key="k", d=4, w=256)
    probe = spark.createDataFrame([(99,)], "k long")
    est = countmin_probe(cms, probe, key="k", d=4, w=256).collect()[0]["est_n"]
    # an unseen key can only pick up collision mass (0 at this width)
    assert 0 <= est <= 3


_BM_KEYS = st.lists(st.integers(0, 500), min_size=1, max_size=80)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(keys=_BM_KEYS, keys2=_BM_KEYS)
def test_bitmap_distinct_exact_and_merge_idempotent(spark, keys, keys2):
    from distgrep_spark.operators.sketches import (
        bitmap_build,
        bitmap_count,
        bitmap_merge,
    )

    df1 = spark.createDataFrame([("g", k) for k in keys], "g string, k long")
    df2 = spark.createDataFrame([("g", k) for k in keys2], "g string, k long")
    bm1 = bitmap_build(df1, key="k", groups=["g"])
    bm2 = bitmap_build(df2, key="k", groups=["g"])
    # exactness on arbitrary multisets (duplicates are free)
    assert bitmap_count(bm1, groups=["g"]).collect()[0]["n_distinct"] == len(
        set(keys)
    )
    # merge = set union, exact under arbitrary overlap; idempotent when
    # merging a bitmap with itself
    merged = bitmap_merge(bm1, bm2)
    assert bitmap_count(merged, groups=["g"]).collect()[0][
        "n_distinct"
    ] == len(set(keys) | set(keys2))
    self_merged = bitmap_merge(bm1, bm1)
    assert {tuple(r) for r in self_merged.collect()} == {
        tuple(r) for r in bm1.collect()
    }
