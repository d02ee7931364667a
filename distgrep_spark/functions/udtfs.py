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
