"""Raw text-corpus ingestion — parity with the reference's native input.

The reference consumes a directory of UTF-8 text files, one map task
per file (master.go:112-158), with the file *name* carried along as
the inverted-index document id (mapper.go:191-203).  The Spark-native
equivalent keeps file granularity without ever buffering files on a
coordinator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(spark: SparkSession, path: str, *, whole_files: bool = True) -> DataFrame:
    """Read a directory of text files as ``(source, text)`` rows.

    ``whole_files=True`` matches the reference's one-row-per-file
    granularity; ``False`` reads line-per-row (better scan parallelism
    for very large single files — the reference's >5 MB failure mode,
    README.md:158, does not exist here).
    """
    if whole_files:
        rdd = spark.sparkContext.wholeTextFiles(path)
        df = rdd.toDF(["source", "text"])
    else:
        df = spark.read.text(path).select(
            F.input_file_name().alias("source"), F.col("value").alias("text")
        )
    # Strip the directory prefix the way invIndexReduce strips the
    # staging prefix "input_" (reducer.go:181) — keep the bare name.
    return df.withColumn("source", F.element_at(F.split("source", "/"), -1))
