"""Driver-facing query registry.

Every operator the engine claims (SURVEY.md §2) registers here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with the
ANSI-SQL oracle DuckDB runs on the same parquet fixtures. Importing this
package imports all query modules, which self-register via the
``@query`` decorator.
"""

from distgrep_spark.queries.registry import ORACLES, QUERIES, query  # noqa: F401

# Import for side effect: each module registers its queries.
from distgrep_spark.queries import grep_queries  # noqa: E402,F401
from distgrep_spark.queries import relational  # noqa: E402,F401
from distgrep_spark.queries import windows  # noqa: E402,F401
from distgrep_spark.queries import llm  # noqa: E402,F401
from distgrep_spark.queries import streaming_twins  # noqa: E402,F401
from distgrep_spark.queries import extras  # noqa: E402,F401
from distgrep_spark.queries import tpch  # noqa: E402,F401
from distgrep_spark.queries import profiling  # noqa: E402,F401
from distgrep_spark.queries import quality  # noqa: E402,F401
from distgrep_spark.queries import analytics  # noqa: E402,F401
from distgrep_spark.queries import stats  # noqa: E402,F401
from distgrep_spark.queries import integration  # noqa: E402,F401
from distgrep_spark.queries import rlhf  # noqa: E402,F401
from distgrep_spark.queries import evalqa  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
