"""Python UDTF (Spark 4): table-generating functions.

The one place a UDTF beats explode(expr): when row generation is
imperative (stateful tokenizers, real sentence splitters, format
parsers). The demonstrator splits text into sentences; its twin SQL
(split + unnest) doubles as the DuckDB oracle, so the UDTF execution
path itself — Arrow batches into Python, rows back — is hash-checked,
not just smoke-tested.

Scale: UDTF calls are per-row Python — keep them OFF hot paths that an
expression can express (the engine's explode-based queries stay
expression-only); where imperative logic is unavoidable this is the
supported seam.

Arrow note (MEASURED, Spark 4.1.2 — do not "optimize" this back):
``useArrow=True`` / ``spark.sql.execution.pythonUDTF.arrow.enabled``
made every UDTF here 3-4x SLOWER in same-process interleaved A/B at
sf0.1 (100k events): table-arg sessions 2.4 s -> 6.3 s, dynamic pivot
2.1 s -> 5.8 s, lateral split 0.3 s -> 1.0 s warm. The Arrow UDTF
input path materializes each batch to pandas and re-boxes per-row
``Row`` objects for ``eval``, which costs more than the pickle row
loop it replaces; this build exposes no batch-size knob for it
(only the enable flags). What DOES pay, measured: shrinking the
pickled row — dropping the datetime column from the TABLE argument
and ordering by the already-computed integer ``sec`` cut
udtf_table_arg_sessions 2.39 s -> 1.78 s median (datetime pickling is
the expensive field). Second measured trap: AQE size-based shuffle
coalescing sees a few-MB exchange and folds it to 1-2 partitions —
correct for JVM stages, but it serializes the *Python CPU* of the
UDTF stage (the slimmer pivot input coalesced harder and ran SLOWER:
2.13 s -> 2.61 s); the TVF inserts its own exchange on an internal
partition_by alias, so a user repartition() upstream cannot pin it.
On a real cluster, size Python-UDTF stages by CPU, not bytes
(spark.sql.adaptive.coalescePartitions.minPartitionSize down, or
parallelismFirst) — here the defaults stay because 252 JVM-side
queries dominate the suite.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sent_id int, sentence string")
class SplitSentences:
    """Rows of (index, sentence) for a '. '-delimited text. The index
    counts raw splits (empties included) so it matches the SQL twin's
    ordinal arithmetic exactly; empty fragments are skipped in both."""

    def eval(self, text: str):  # noqa: D102 - contract fixed by Spark
        if text is None:
            return
        for i, part in enumerate(text.split(". ")):
            if part:
                yield i, part


@udtf(returnType="user_id bigint, n_sessions bigint, longest_run int")
class UserSessionStats:
    """Polymorphic-input UDTF consuming ``TABLE(...) PARTITION BY
    user_id ORDER BY ts, event_id`` — the Spark 4 table-argument
    surface: each partition's rows stream through ONE instance in
    order, ``terminate()`` emits the per-user summary. Imperative
    per-entity state (session counting at a 1800 s gap + longest
    same-event-type run) that the engine also expresses declaratively
    (sessionize_events, text_max_token_run) — here the point is the
    API: partition-ordered streaming input into Python with end-of-
    partition aggregation, the applyInPandasWithState shape for
    batch. The SQL twin oracles the whole Arrow round trip."""

    def __init__(self) -> None:
        self.user = None
        self.prev_sec = None
        self.n_sessions = 0
        self.prev_type = None
        self.run = 0
        self.longest = 0

    def eval(self, row):  # noqa: D102 - contract fixed by Spark
        self.user = row.user_id
        sec = row.sec
        if self.prev_sec is None or sec - self.prev_sec > 1800:
            self.n_sessions += 1
        self.prev_sec = sec
        if row.event_type == self.prev_type:
            self.run += 1
        else:
            self.run = 1
            self.prev_type = row.event_type
        if self.run > self.longest:
            self.longest = self.run

    def terminate(self):  # noqa: D102 - contract fixed by Spark
        if self.user is not None:
            yield self.user, self.n_sessions, self.longest


class PivotTypeCounts:
    """Dynamic-output-schema UDTF: ``analyze()`` computes the result
    schema AT PLAN TIME from the constant type-list argument — one
    ``n_<type>`` column per requested event type — the Spark 4
    polymorphic-UDTF surface static ``returnType`` strings can't
    express (a true dynamic pivot needs it: column set = data-driven
    config). Consumes ``TABLE(...) PARTITION BY user_id`` rows of
    ``(user_id, event_type, cnt)`` and emits one row per partition
    from ``terminate()``.

    The input is a PRE-AGGREGATED (user, type, count) rollup, not raw
    events — the CLAUDE.md sketch-from-rollup discipline applied to
    the Python seam: counting is distributive, so the JVM does the
    per-fact work map-side and Python only folds ~|users|x|types|
    rollup rows into the dynamic-width result (measured 2.7 s ->
    ~0.6 s at sf0.1; row pickling was 95% of the cost). The dynamic
    ``analyze()`` schema — the thing a UDTF is FOR here — is
    unaffected. Keep per-fact Python for logic that genuinely cannot
    pre-reduce (UserSessionStats' ordered session walk above)."""

    @staticmethod
    def analyze(table_arg, types_arg):  # noqa: D102 - contract fixed by Spark
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import LongType, StructField, StructType

        fields = [StructField("user_id", LongType())]
        for t in types_arg.value.split(","):
            fields.append(StructField(f"n_{t}", LongType()))
        return AnalyzeResult(StructType(fields))

    def __init__(self) -> None:
        self.user = None
        self.types = None
        self.counts = None

    def eval(self, row, types):  # noqa: D102 - contract fixed by Spark
        if self.types is None:
            self.types = types.split(",")
            self.counts = {t: 0 for t in self.types}
            # Input contract (round-4 advice): rows must be the
            # pre-aggregated (user_id, event_type, cnt) rollup — fail
            # loudly at the first row instead of an AttributeError
            # deep in the Python worker if a caller passes raw events
            # (the pre-round-4 contract).
            if "cnt" not in row.__fields__:
                raise TypeError(
                    "PivotTypeCounts requires pre-aggregated rows "
                    "(user_id, event_type, cnt); got fields "
                    f"{list(row.__fields__)} — aggregate counts JVM-side "
                    "first (see udtf_analyze_dynamic_pivot)"
                )
        self.user = row.user_id
        if row.event_type in self.counts:
            self.counts[row.event_type] += row.cnt

    def terminate(self):  # noqa: D102 - contract fixed by Spark
        if self.user is not None:
            yield (self.user, *[self.counts[t] for t in self.types])
