"""Property-based verification of the TTL-suppression dedup rule: for
ARBITRARY small event sets, the batch lag-window form (the DuckDB-
oracled twin) must agree with the obvious sequential Python reference —
walk each key's events in (ts, event_id) order and emit exactly those
more than TTL past the previous RAW event. Small key/time domains force
collisions, exact-TTL boundary gaps, and same-timestamp ties."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distgrep_spark.streaming.stateful import (
    THROTTLE_TTL_MINUTES,
    throttle_dedup,
)

BASE = datetime(2024, 1, 1)

# (user, type-index, offset-minutes): a tight domain around the 120-min
# TTL so gaps land below, exactly at, and above the boundary
_EVENTS = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 1), st.integers(0, 500)),
    min_size=1,
    max_size=10,
)


def _reference(rows):
    """Sequential rule: emit iff no same-key event in the preceding TTL
    (anchor = previous RAW event, strictly-greater-than gap)."""
    out = set()
    last: dict[tuple, int] = {}
    for eid, uid, etype, minutes in sorted(
        rows, key=lambda r: (r[1], r[2], r[3], r[0])
    ):
        key = (uid, etype)
        us = minutes * 60_000_000
        prev = last.get(key)
        if prev is None or us - prev > THROTTLE_TTL_MINUTES * 60_000_000:
            out.add(eid)
        last[key] = us  # every event refreshes the anchor
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_EVENTS)
def test_throttle_batch_matches_sequential_reference(spark, events):
    rows = [
        (i, u, f"t{t}", m) for i, (u, t, m) in enumerate(events)
    ]
    df = spark.createDataFrame(
        [
            (eid, uid, etype, BASE + timedelta(minutes=m))
            for eid, uid, etype, m in rows
        ],
        "event_id bigint, user_id bigint, event_type string, ts timestamp",
    )
    got = {r["event_id"] for r in throttle_dedup(df).collect()}
    assert got == _reference(rows)
