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
) -> DataFrame:
    """Backward as-of left join.

    Returns every ``left`` row with ``right_ts`` + ``payload`` columns
    from the latest ``right`` row at or before the left row's
    ``left_ts`` (nulls when no right row precedes it — left-join
    semantics). Ties on the timestamp take the right row (inclusive
    ``<=``), matching DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``.

    ``right`` must be unique per (key, right_ts) — pre-aggregate it
    otherwise, or which duplicate wins is engine-dependent on BOTH sides
    of any oracle comparison.
    """
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
    # right (_is_left=0) sorts before left at equal _t -> inclusive match
    w = (
        Window.partitionBy(*on)
        .orderBy("_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *left.columns,
        "_is_left",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in [right_ts, *payload]],
    )
    return filled.where(F.col("_is_left") == 1).drop("_is_left")
