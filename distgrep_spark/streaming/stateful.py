"""Custom stateful streaming operator via applyInPandasWithState.

Built-in windowed aggregations cover time-bucketed state
(streaming/pipelines.py); this module is the escape hatch for operator
semantics Spark's declarative surface can't express — arbitrary per-key
state machines. The demonstrator keeps a running (count, sum) per user
across micro-batches: the state store holds one tiny row per key, state
updates are Arrow-batched pandas (not row-at-a-time Python), and the
output stream emits the refreshed totals for exactly the keys seen in
each batch ("update" semantics).

Scale notes: state is partitioned by the grouping key across executors
(same hash exchange as any groupBy), checkpointed incrementally, and
bounded by key cardinality — not by stream length. For keys that churn
(sessions, not users) attach a GroupStateTimeout so dead keys expire
instead of accumulating forever.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, s double"


def _update_totals(
    key: tuple, pdfs: Iterator, state: GroupState
) -> Iterator:
    import pandas as pd

    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [s]}
    )


def running_user_totals(df: DataFrame) -> DataFrame:
    """Running (count, sum(value)) per user, carried across batches.

    Streaming: per-key state via applyInPandasWithState ("update" mode —
    each batch emits refreshed totals for the users it touched).
    Batch: the same result is a plain groupBy — which is also the test
    oracle: after an availableNow run drains the stream, the LAST update
    per user must equal the batch aggregate.
    """
    if not df.isStreaming:
        import pyspark.sql.functions as F

        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("total_value"),
        )
    return df.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
