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


def test_salted_shuffle_join_matches_plain(spark):
    from grpc_map_reduce_spark.operators.skew import salted_shuffle_join

    probe = _skewed_df(spark)
    build = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), "id").alias("name")
    )
    got = salted_shuffle_join(probe, build, "k", n_salts=8)
    want = probe.join(build, "k")
    assert sorted(map(tuple, got.select("k", "v", "name").collect())) == \
        sorted(map(tuple, want.select("k", "v", "name").collect()))


def test_salted_shuffle_join_plan_is_not_broadcast(spark):
    """The operator exists for the build-side-too-big-to-broadcast
    case; the hint must hold even when the fixture build side is tiny
    enough for Catalyst to auto-broadcast."""
    from grpc_map_reduce_spark.operators.skew import salted_shuffle_join
    from grpc_map_reduce_spark.plans.audit import explain_str

    probe = _skewed_df(spark)
    build = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), "id").alias("name")
    )
    plan = explain_str(salted_shuffle_join(probe, build, "k"), "formatted")
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan


def test_salt_is_retry_stable(spark):
    """The salt must be a pure function of (partition id, row content):
    recomputing the same input twice yields identical salted groups —
    the property a task retry relies on for exactly-once results.
    (monotonically_increasing_id, the previous salt key, changes when
    rows shift position and silently double-counts partials.)"""
    from grpc_map_reduce_spark.operators.skew import _salt

    df = _skewed_df(spark)
    a = sorted(map(tuple, df.withColumn("s", _salt(df, 16)).collect()))
    b = sorted(map(tuple, df.withColumn("s", _salt(df, 16)).collect()))
    assert a == b
    # and it actually spreads the hot key across many salts
    n_groups = (
        df.withColumn("s", _salt(df, 16))
        .filter(F.col("k") == 7).select("s").distinct().count()
    )
    assert n_groups > 4
