"""Custom Python DataSource (Spark 4 API): partitioned synthetic
documents.

Demonstrates the engine's source-extensibility path — the same API a
production build would use to wrap an internal record service or object
store behind a DataFrame. The source is:

- **partitioned**: the driver plans ``num_partitions`` splits; each
  executor generates only its slice (no driver materialization — the
  anti-pattern the reference's whole-file read embodies,
  client.go:56-60),
- **deterministic**: content is a pure function of (seed, doc_id), so
  runs, retries, and speculative tasks all agree,
- **schema-stable**: fixed StructType, no inference.

Register per-session with ``spark.dataSource.register(SyntheticDocs)``,
then ``spark.read.format("synthetic_docs").option(...).load()``.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_WORDS = (
    "the spark engine grep line data query join shuffle stream token "
    "filter count window batch row scan plan hash sort merge map"
).split()


def _doc_text(seed: int, doc_id: int) -> str:
    state = (seed * 1_000_003 + doc_id * 7919 + 12345) & 0x7FFFFFFF
    words = []
    n = 5 + state % 20
    for _ in range(n):
        state = (1103515245 * state + 12345) % (1 << 31)
        words.append(_WORDS[state % len(_WORDS)])
    return " ".join(words)


class _Split(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("num_partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        per = -(-self.n_docs // self.num_partitions)  # ceil
        return [
            _Split(i * per, min((i + 1) * per, self.n_docs))
            for i in range(self.num_partitions)
            if i * per < self.n_docs
        ]

    def read(self, partition: _Split) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            text = _doc_text(self.seed, doc_id)
            yield (doc_id, text, len(text))


class SyntheticDocs(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, n_chars int"

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticDocsReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> "SyntheticDocsStreamReader":
        return SyntheticDocsStreamReader(self.options)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch STREAMING reader over the same deterministic corpus —
    the Spark 4 ``simpleStreamReader`` seam (python datasource streaming
    API): offsets are plain doc_id watermarks ``{"next": k}``, each
    micro-batch serves ``batch_docs`` ids, and because content is a pure
    function of (seed, doc_id), ``readBetweenOffsets`` REPLAYS any
    committed range bit-identically — the property that makes
    checkpoint recovery exactly-once for this source (the contract a
    production wrapper over a log/queue must honor; offsets here play
    the role of Kafka offsets).

    ``max_docs`` bounds the stream so availableNow triggers drain to a
    fixed row count in tests; a production feed would leave it open.
    """

    def __init__(self, options: dict):
        self.seed = int(options.get("seed", 42))
        self.batch_docs = int(options.get("batch_docs", 100))
        self.max_docs = int(options.get("max_docs", 1000))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _rows(self, start: int, end: int):
        # a LIST-iterator, not a generator: the prefetch wrapper both
        # calls next() on it (empty-batch validation) AND pickles it
        # into the driver-side cache for replay — list iterators
        # satisfy both, generators cannot be pickled
        return iter(
            [
                (doc_id, (t := _doc_text(self.seed, doc_id)), len(t))
                for doc_id in range(start, end)
            ]
        )

    def read(self, start: dict):
        s = int(start["next"])
        e = min(s + self.batch_docs, self.max_docs)
        return self._rows(s, e), {"next": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["next"]), int(end["next"]))
