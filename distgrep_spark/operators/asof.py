"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the latest right row whose timestamp is <= the
left row's timestamp, per join key (the "backward" as-of of kdb/Pandas/
DuckDB ``ASOF JOIN``).

Implemented as the scalable union+window-fill composition rather than a
theta-join: a ``left.ts >= right.ts`` range join degenerates to
per-key-quadratic work (every left row matches half the right rows
before the top-1 prune), while the union plan is one hash exchange on
the key and one per-partition sort —

    union(tagged left, tagged right)
      -> Window.partitionBy(key).orderBy(ts, tag)
      -> last(payload, ignorenulls=True)   # carries the most recent
      -> filter(tag == left)               # right value forward

exactly the merge-scan an as-of join means, and it scales to 100 TB the
same way any single-key windowed aggregation does (AQE handles skewed
keys; no broadcast needed on either side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of left join: backward (default), forward, or nearest.

    ``backward``: every ``left`` row gets ``right_ts`` + ``payload``
    from the LATEST right row at or before its ``left_ts`` (DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts``). ``forward``: from the EARLIEST
    right row at or after it (``ON l.ts <= r.ts`` — the "next reading"
    join). ``nearest``: whichever of the two is closer in time, ties to
    the backward side — the sensor-alignment join. Nulls when no right
    row qualifies — left-join semantics. Ties on the timestamp take the
    right row (inclusive) in all directions (for ``nearest`` the equal-
    ts row arrives through the backward fill at distance zero, which
    wins every tie, so the forward fill may skip it harmlessly).

    ``right`` must be unique per (key, right_ts) — pre-aggregate it
    otherwise, or which duplicate wins is engine-dependent on BOTH sides
    of any oracle comparison.

    ``tolerance_seconds`` (pandas merge_asof semantics): a match whose
    |left_ts - right_ts| exceeds the bound is nulled out AFTER the fill
    — a pure map-side mask on the one-exchange plan, never a second
    join. The gap is exact integer microseconds via
    ``timestampdiff(MICROSECOND, ...)`` (the NTZ-safe form; CLAUDE.md
    forbids unix_timestamp/epoch diffs).

    All three are the same ONE-exchange union + window-fill scan;
    forward flips the frame (current→following, first instead of last)
    and the equal-ts tag order so inclusivity is preserved, and nearest
    runs BOTH fills over the one sorted scan and picks per row — still
    a single exchange, where the naive two-asof-joins-then-join plan
    costs three.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if tolerance_seconds is not None and tolerance_seconds < 0:
        raise ValueError(f"tolerance_seconds must be >= 0, got {tolerance_seconds}")

    def _tol(res: DataFrame) -> DataFrame:
        if tolerance_seconds is None:
            return res
        ok = F.expr(
            f"abs(timestampdiff(MICROSECOND, {right_ts}, {left_ts}))"
            f" <= CAST({tolerance_seconds} AS BIGINT) * 1000000"
        )
        masked = {c: F.when(ok, F.col(c)).alias(c) for c in [right_ts, *payload]}
        return res.select(
            *[masked.get(c, F.col(c)).alias(c) for c in res.columns]
        )
    for c in [right_ts, *payload]:
        if c in left.columns:
            raise ValueError(f"column {c!r} exists on both sides; alias it first")
    l_tag = left.withColumn("_t", F.col(left_ts)).withColumn("_is_left", F.lit(1))
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.col(right_ts),
        *payload,
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    if direction == "nearest":
        order = [F.col("_t"), F.col("_is_left")]
        wb = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        prev = {c: F.last(c, ignorenulls=True).over(wb) for c in [right_ts, *payload]}
        nxt = {c: F.first(c, ignorenulls=True).over(wf) for c in [right_ts, *payload]}
        choose_prev = nxt[right_ts].isNull() | (
            prev[right_ts].isNotNull()
            & ((F.col("_t") - prev[right_ts]) <= (nxt[right_ts] - F.col("_t")))
        )
        filled = u.select(
            *left.columns,
            "_is_left",
            *[
                F.when(choose_prev, prev[c]).otherwise(nxt[c]).alias(c)
                for c in [right_ts, *payload]
            ],
        )
        return _tol(filled.where(F.col("_is_left") == 1).drop("_is_left"))
    if direction == "backward":
        # right (_is_left=0) sorts before left at equal _t -> inclusive
        w = (
            Window.partitionBy(*on)
            .orderBy("_t", "_is_left")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        # left sorts before right at equal _t -> the equal-ts right row
        # is inside the (currentRow, following) frame -> inclusive
        w = (
            Window.partitionBy(*on)
            .orderBy("_t", F.col("_is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fill = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    filled = u.select(
        *left.columns,
        "_is_left",
        *[fill(c).alias(c) for c in [right_ts, *payload]],
    )
    return _tol(filled.where(F.col("_is_left") == 1).drop("_is_left"))
