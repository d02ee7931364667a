"""Hypothesis property tests for batch 8-16 kernels: the fixture-based
tests pin current behavior; these certify the algorithms on adversarial
inputs (tiny Spark jobs per example — keep max_examples low)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Grid spatial join == brute force on arbitrary integer points
# ---------------------------------------------------------------------------

points_strategy = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)),
    min_size=2,
    max_size=25,
    unique=True,
)


@settings(max_examples=8, deadline=None)
@given(pts=points_strategy, r=st.integers(1, 4))
def test_grid_join_equals_brute_on_random_points(spark, pts, r):
    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "k long, x long, y long")
    probe = df.selectExpr(
        "k",
        "x",
        "y",
        "explode(flatten(transform(sequence(-1, 1), dx ->"
        " transform(sequence(-1, 1), dy ->"
        f" struct(x DIV {r} + dx AS cx, y DIV {r} + dy AS cy))))) AS cell",
    ).selectExpr("k AS ka", "x AS xa", "y AS ya", "cell.cx AS cx", "cell.cy AS cy")
    build = df.selectExpr(
        "k AS kb", "x AS xb", "y AS yb", f"xb DIV {r} AS cx", f"yb DIV {r} AS cy"
    )
    got = {
        (row["ka"], row["kb"])
        for row in probe.join(build, ["cx", "cy"])
        .where(f"ka < kb AND abs(xa - xb) <= {r} AND abs(ya - yb) <= {r}")
        .collect()
    }
    brute = {
        (i, j)
        for i in range(len(pts))
        for j in range(i + 1, len(pts))
        if abs(pts[i][0] - pts[j][0]) <= r and abs(pts[i][1] - pts[j][1]) <= r
    }
    assert got == brute


# ---------------------------------------------------------------------------
# Largest-remainder apportionment: exact sum, within-1 fairness
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    counts=st.lists(st.integers(1, 10_000), min_size=1, max_size=8),
    budget=st.integers(10, 100_000),
)
def test_largest_remainder_properties(spark, counts, budget):
    rows = [(f"s{i}", c) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "source string, tokens long")
    tot = df.agg(F.expr("CAST(sum(tokens) AS BIGINT) AS total"))
    quota = df.crossJoin(F.broadcast(tot)).selectExpr(
        "source",
        "tokens",
        f"tokens * {budget} DIV total AS floor_alloc",
        f"tokens * {budget} % total AS remainder",
    )
    out = quota.selectExpr(
        "*",
        "row_number() OVER (ORDER BY remainder DESC, source) AS rem_rank",
        f"CAST({budget} - sum(floor_alloc) OVER () AS BIGINT) AS leftover",
    ).selectExpr(
        "source",
        "tokens",
        "floor_alloc + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END"
        " AS alloc",
    )
    got = {r["source"]: r["alloc"] for r in out.collect()}
    assert sum(got.values()) == budget
    total = sum(counts)
    for i, c in enumerate(counts):
        exact = c * budget / total
        assert abs(got[f"s{i}"] - exact) < 1.0


# ---------------------------------------------------------------------------
# Weighted median: cumulative-weight definition on arbitrary multisets
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    vw=st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 20)),
        min_size=1,
        max_size=12,
    )
)
def test_weighted_median_lower_definition(spark, vw):
    # collapse duplicate values (the query rolls up first)
    agg: dict[int, int] = {}
    for v, w in vw:
        agg[v] = agg.get(v, 0) + w
    df = spark.createDataFrame(list(agg.items()), "v long, wt long")
    cum = df.selectExpr(
        "v",
        "wt",
        "CAST(sum(wt) OVER (ORDER BY v"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw",
        "CAST(sum(wt) OVER () AS BIGINT) AS tw",
    )
    (row,) = (
        cum.groupBy("tw")
        .agg(F.expr("CAST(min(CASE WHEN 2 * cw >= tw THEN v END) AS BIGINT) AS med"))
        .collect()
    )
    med, tw = row["med"], row["tw"]
    below = sum(w for v, w in agg.items() if v < med)
    at_or_below = sum(w for v, w in agg.items() if v <= med)
    assert 2 * at_or_below >= tw
    assert 2 * below < tw


# ---------------------------------------------------------------------------
# Haar detail energies == direct transform on arbitrary integer series
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    series=st.lists(st.integers(0, 500), min_size=8, max_size=64),
    k=st.integers(1, 3),
)
def test_haar_scale_energy_equals_direct(spark, series, k):
    rows = [(i, c) for i, c in enumerate(series)]
    df = spark.createDataFrame(rows, "idx long, c long")
    size = 1 << k
    half = 1 << (k - 1)
    got = (
        df.where(f"idx DIV {size} < {len(series) // size}")
        .selectExpr(
            f"idx DIV {size} AS block",
            f"(1 - 2 * ((idx DIV {half}) % 2)) * c AS s",
        )
        .groupBy("block")
        .agg(F.expr("CAST(sum(s) AS BIGINT) AS detail"))
        .agg(F.expr("CAST(sum(detail * detail) AS BIGINT) AS e"))
        .first()["e"]
    )
    want = 0
    for b in range(len(series) // size):
        block = series[b * size : (b + 1) * size]
        d = sum(block[:half]) - sum(block[half:])
        want += d * d
    assert got == want
