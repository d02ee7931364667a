"""Data sources: fixture catalog + generic readers.

The reference's only source is a whole-file in-memory text read
(reference client.go:56-60); at scale that is a partitioned ``text`` scan.
Here we expose every source the engine supports: the parquet fixture
catalog, raw text, csv, json — all schema-explicit where inference would
cost an extra scan.
"""

from distgrep_spark.sources.catalog import TABLES, load_table, register_views
from distgrep_spark.sources.readers import read_csv, read_json, read_lines

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "read_lines",
    "read_csv",
    "read_json",
]
