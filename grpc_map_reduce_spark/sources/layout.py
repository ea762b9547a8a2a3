"""Storage layout for scale: bucketing and partitioned writes.

At 100 TB the dominant cost of a fact-fact join is shuffling both
sides on the join key — unless the data was WRITTEN co-located.
These helpers own that layout contract:

  * ``write_bucketed`` — hash-bucket + sort by the join/agg key at
    write time.  Two tables bucketed the same way join with ZERO
    exchanges (Spark reads bucket i of A and bucket i of B into the
    same task); aggregations on the bucket key skip their shuffle
    too.  The write itself pays one shuffle — amortized over every
    downstream join against the layout.
  * ``write_date_partitioned`` — hive-style directory partitioning
    on a date column.  Date-range predicates prune entire
    directories at planning time (``PartitionFilters`` in the scan,
    0 files read outside the range) — the storage analog of parquet
    row-group pushdown, and the difference between scanning 100 TB
    and scanning one day.

Bucketed tables go through the session catalog (``saveAsTable``) —
bucket metadata lives in the table definition, which is what lets
the planner trust the layout.  Plan-level guarantees are asserted in
``tests/test_layout.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   n_buckets: int = 8) -> None:
    """Persist ``df`` hash-bucketed and sorted by ``key``."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket specs the physical plan has no Exchange on
    either side — assert via ``plans.audit.explain_str``.
    """
    return spark.table(left_table).join(spark.table(right_table), key)


def write_date_partitioned(df: DataFrame, path: str, date_col: str) -> None:
    """Write hive-style ``{path}/{date_col}=YYYY-MM-DD/...`` layout."""
    df.write.mode("overwrite").partitionBy(date_col).parquet(path)
