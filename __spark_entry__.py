"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`grpc_map_reduce_spark.registry` — the registry is
the single source of truth for the implemented query inventory
(SURVEY.md §2) and the matching DuckDB oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from grpc_map_reduce_spark import registry
from grpc_map_reduce_spark.operators.wordcount import wordcount
from grpc_map_reduce_spark.sources.tables import table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's `wc` job over sf0.001 documents."""
    docs = table(spark, "/root/testdata/sf0.001", "documents")
    return wordcount(docs)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return registry.oracle_sqls()
