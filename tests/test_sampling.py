"""Behavior tests for the mixture resampler on crafted inputs (oracle
parity at sf0.001 is covered via the registry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from grpc_map_reduce_spark.operators.sampling import mixture_epoch_resample


def _corpus(spark, per_source):
    rows, i = [], 0
    for src, n in per_source.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_upsamples_weighted_source(spark):
    df = _corpus(spark, {"head": 80, "tail": 20})
    # weight tail 8x: W = 80·1 + 20·8 = 240; tail ratio = 100·8/240 ≈
    # 3.33 epochs, head ratio = 100/240 ≈ 0.42.
    out = mixture_epoch_resample(df, weights={"tail": 8}, default_weight=1)
    per = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # Every tail row gets >= 3 full epochs; realized counts near target.
    assert per["tail"] >= 60  # 20 rows x 3 guaranteed epochs
    assert 20 <= per["head"] <= 50
    epochs = {r["epoch"] for r in out.filter("source = 'tail'").collect()}
    assert {1, 2, 3} <= epochs


def test_mixture_budget_and_determinism(spark):
    df = _corpus(spark, {"a": 50, "b": 50})
    out1 = mixture_epoch_resample(df, weights={}, default_weight=1)
    # equal weights, 100% budget -> identity resample: every row once.
    assert out1.count() == 100
    assert out1.filter("epoch <> 1").count() == 0
    # half budget -> ~50 rows, deterministic across re-runs.
    half1 = mixture_epoch_resample(df, weights={}, budget_pct=50)
    half2 = mixture_epoch_resample(df, weights={}, budget_pct=50)
    ids1 = sorted(r["doc_id"] for r in half1.collect())
    ids2 = sorted(r["doc_id"] for r in half2.collect())
    assert ids1 == ids2
    assert 35 <= len(ids1) <= 65


def test_temperature_resample_flattens_head(spark):
    from grpc_map_reduce_spark.operators.sampling import temperature_epoch_resample

    rows = [(i, "head" if i < 900 else "tail") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_epoch_resample(df).groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in out}
    # sqrt scaling: target shares ~ sqrt(900):sqrt(100) = 3:1 (not the
    # raw 9:1), under a 100% row budget => head ~750, tail ~250
    assert 650 <= got["head"] <= 850, got
    assert 180 <= got["tail"] <= 320, got
    # tail rows upsampled (multiple epochs), head rows downsampled
    assert got["tail"] > 100 and got["head"] < 900
