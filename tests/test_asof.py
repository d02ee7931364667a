"""As-of join semantics (operators/asof.py) on a hand-built timeline.

The interesting edges: inclusive tie (left row AT a right timestamp takes
it), no-preceding-right (nulls, left-join), key isolation (user B never
sees user A's rows), and multiple right rows (latest wins, not first)."""

from __future__ import annotations

from datetime import datetime

import pytest

from distgrep_spark.operators.asof import asof_join


def ts(s: int):
    return datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def joined(spark):
    left = spark.createDataFrame(
        [
            (1, "A", ts(5)),   # after r@2 and r@5 -> tie, takes r@5
            (2, "A", ts(4)),   # after r@2 only
            (3, "A", ts(1)),   # before any right row -> nulls
            (4, "B", ts(9)),   # key B: only B's right rows count
        ],
        ["event_id", "key", "t"],
    )
    right = spark.createDataFrame(
        [
            ("A", ts(2), 20.0),
            ("A", ts(5), 50.0),
            ("A", ts(7), 70.0),  # in the future of every left row
            ("B", ts(3), 30.0),
        ],
        ["key", "rt", "val"],
    )
    out = asof_join(
        left, right, on=["key"], left_ts="t", right_ts="rt", payload=["val"]
    )
    return {r["event_id"]: r for r in out.collect()}


def test_all_left_rows_survive(joined):
    assert set(joined) == {1, 2, 3, 4}


def test_tie_is_inclusive(joined):
    assert joined[1]["val"] == 50.0 and joined[1]["rt"] == ts(5)


def test_picks_latest_not_first(joined):
    assert joined[2]["val"] == 20.0 and joined[2]["rt"] == ts(2)


def test_no_preceding_right_gives_nulls(joined):
    assert joined[3]["val"] is None and joined[3]["rt"] is None


def test_keys_are_isolated(joined):
    assert joined[4]["val"] == 30.0


def test_collision_guard(spark):
    left = spark.createDataFrame([(1, "A", ts(1), 0.0)], ["id", "key", "t", "val"])
    right = spark.createDataFrame([("A", ts(1), 1.0)], ["key", "rt", "val"])
    with pytest.raises(ValueError, match="both sides"):
        asof_join(left, right, on=["key"], left_ts="t", right_ts="rt", payload=["val"])
