"""Salting must be result-invariant: salted operators produce exactly
the rows of their unsalted equivalents on skewed inputs."""

from __future__ import annotations

from pyspark.sql import functions as F


def _skewed_df(spark):
    # 10k rows of one hot key + a long tail
    return spark.range(11_000).select(
        F.when(F.col("id") < 10_000, F.lit(7)).otherwise(F.col("id") % 50)
        .cast("long").alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def test_salted_aggregate_matches_plain(spark):
    from grpc_map_reduce_spark.operators.skew import salted_aggregate

    df = _skewed_df(spark)
    got = salted_aggregate(
        df, ["k"], {"cnt": F.lit(1), "total": F.col("v")}, n_salts=16
    )
    want = df.groupBy("k").agg(
        F.sum(F.lit(1)).alias("cnt"), F.sum("v").alias("total")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_broadcast_join_matches_plain(spark):
    from grpc_map_reduce_spark.operators.skew import salted_broadcast_join

    probe = _skewed_df(spark)
    build = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), "id").alias("name")
    )
    got = salted_broadcast_join(probe, build, "k", n_salts=8)
    want = probe.join(build, "k")
    assert sorted(map(tuple, got.select("k", "v", "name").collect())) == \
        sorted(map(tuple, want.select("k", "v", "name").collect()))
