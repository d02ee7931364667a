"""Grid spatial join: hot-cell salting correctness (operators/spatial.py).

The salted plan must return EXACTLY the pairs of the naive quadratic on
a deliberately hub-skewed point set — with the threshold forced low so
the splitting path actually executes (at fixture densities the hot list
is empty and salting is dormant; these tests are the ones that exercise
it)."""

from __future__ import annotations

from itertools import combinations

from distgrep_spark.operators.spatial import grid_neighbor_pairs

R = 2


def _brute(points):
    out = set()
    for (ka, xa, ya), (kb, xb, yb) in combinations(sorted(points), 2):
        if abs(xa - xb) <= R and abs(ya - yb) <= R:
            out.add((ka, kb, xb - xa, yb - ya))
    return out


def _points_hub():
    # 40 coincident-ish points in one cell (the hub) + a sparse ring of
    # loners, some adjacent to the hub's neighborhood, some far away.
    pts = [(i, 10 + (i % 2), 10 + (i % 3)) for i in range(40)]  # hub cell
    pts += [(100 + i, 50 + 7 * i, 50 + 11 * i) for i in range(10)]  # far
    pts += [(200 + i, 12 + i, 13) for i in range(4)]  # hub-adjacent
    return pts


def _run(spark, pts, **kw):
    df = spark.createDataFrame(pts, "k long, x long, y long")
    rows = grid_neighbor_pairs(df, radius=R, **kw).collect()
    got = {(r.key_a, r.key_b, r.dx, r.dy) for r in rows}
    assert len(got) == len(rows), "pair emitted more than once"
    return got

def test_salted_matches_brute_force_on_hub(spark):
    pts = _points_hub()
    expected = _brute(pts)
    # threshold 8 => the 40-point hub splits into 5 salt buckets
    got = _run(spark, pts, hot_threshold=8)
    assert got == expected


def test_salted_equals_unsalted(spark):
    pts = _points_hub()
    assert _run(spark, pts, hot_threshold=8) == _run(spark, pts, hot_threshold=None)


def test_split_factor_cap(spark):
    # 600 points in one cell with max_splits=4: still exact.
    pts = [(i, 7, 7) for i in range(600)] + [(1000, 100, 100)]
    expected = _brute(pts)
    got = _run(spark, pts, hot_threshold=8, max_splits=4)
    assert got == expected


def test_salted_exact_under_shuffle_join(spark):
    # The regime salting exists for: broadcast disabled, so the main
    # join shuffles on (cell, salt). Same brute-force equality.
    pts = _points_hub()
    expected = _brute(pts)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        got = _run(spark, pts, hot_threshold=8)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == expected


def test_hot_list_engages(spark):
    # White-box: with threshold 8 the hub cell must appear in the salted
    # plan as a >1 split factor — guard that the adaptive path is not
    # silently dead (e.g. a broken count or join key).
    from pyspark.sql import functions as F

    df = spark.createDataFrame(_points_hub(), "k long, x long, y long")
    build = df.selectExpr(
        "k AS kb", f"x DIV {R} AS cx", f"y DIV {R} AS cy"
    )
    hot = (
        build.groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 8)
    )
    assert hot.count() >= 1
