"""Column-function helpers shared by operators and queries."""

from distgrep_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum

__all__ = ["dsum", "davg", "sql_dsum", "sql_davg"]
