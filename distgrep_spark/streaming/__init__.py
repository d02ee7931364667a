"""Structured-Streaming surface (SURVEY.md §2.2 "Streaming").

The reference is a one-shot request/response job (client.go:63); its
Spark-idiomatic generalization is a continuous pipeline over the same
DataFrame verbs. Every transformation here takes *either* a batch or a
streaming DataFrame and applies identical logic — the batch twin that the
driver's DuckDB oracle checks IS the code the stream runs, so correctness
transfers from the batch gate to the streaming path by construction.
"""

from distgrep_spark.streaming.pipelines import (
    EVENT_SCHEMA,
    grep_event_counts,
    read_event_stream,
    session_counts,
    sliding_counts,
    stateful_dedup,
    tumbling_counts,
)

__all__ = [
    "EVENT_SCHEMA",
    "read_event_stream",
    "grep_event_counts",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "stateful_dedup",
]
