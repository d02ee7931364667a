"""Property-based verification of the salted spatial grid join
(operators/spatial.py): for ARBITRARY small integer point sets —
coincident points, hub pileups, cell-boundary coordinates, negative
coordinates — the salted plan must return EXACTLY the brute-force
L-infinity pair set, with the hot-cell splitting path forced on by a
tiny threshold and across radii and split caps."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distgrep_spark.operators.spatial import grid_neighbor_pairs

# Tiny coordinate domain forces coincidence, hub cells, and boundary
# hits; negatives exercise DIV's floor-vs-truncate edge on cell ids.
_PTS = st.lists(
    st.tuples(st.integers(-6, 12), st.integers(-6, 12)),
    min_size=1,
    max_size=14,
)


def _brute(points, r):
    out = set()
    for (ka, xa, ya), (kb, xb, yb) in combinations(points, 2):
        if abs(xa - xb) <= r and abs(ya - yb) <= r:
            out.add((ka, kb, xb - xa, yb - ya))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pts=_PTS, radius=st.integers(1, 4), max_splits=st.integers(1, 5))
def test_salted_grid_matches_brute_force(spark, pts, radius, max_splits):
    points = [(i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(points, "k long, x long, y long")
    rows = grid_neighbor_pairs(
        df, radius=radius, hot_threshold=2, max_splits=max_splits
    ).collect()
    got = {(r.key_a, r.key_b, r.dx, r.dy) for r in rows}
    assert len(got) == len(rows), "pair emitted more than once"
    assert got == _brute(sorted(points), radius)
