"""Semantics tests for the time-series operators beyond the oracle
hash: grid completeness / zero-fill / carry-forward for gap_fill, and
agreement of the exact-integer z-score cut with a float reference."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from grpc_map_reduce_spark.operators.timeseries import (
    anomaly_zscore,
    gap_fill_hourly,
)


def _events(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                    "event_type", "value"])
    )


def test_gap_fill_grid_zero_fill_and_carry(spark):
    t = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, t, 7, "view", 10.00),
        # 3-hour silence, then two events in hour 4
        (2, t + dt.timedelta(hours=4), 7, "view", 2.50),
        (3, t + dt.timedelta(hours=4, minutes=9), 7, "click", 0.50),
    ]
    out = gap_fill_hourly(_events(spark, rows)).orderBy("hour").collect()
    assert len(out) == 5  # hours 0..4 inclusive
    assert [r.n_events for r in out] == [1, 0, 0, 0, 2]
    assert [r.hour_value_cents for r in out] == [1000, 0, 0, 0, 300]
    # carry-forward holds the last non-silent hour's total through gaps
    assert [r.carried_value_cents for r in out] == [1000, 1000, 1000, 1000, 300]


def test_gap_fill_single_event_user(spark):
    rows = [(1, dt.datetime(2024, 1, 1, 5, 59), 3, "view", 1.00)]
    out = gap_fill_hourly(_events(spark, rows)).collect()
    assert len(out) == 1
    assert out[0].n_events == 1 and out[0].carried_value_cents == 100


def test_anomaly_matches_float_zscore(spark):
    # one wild outlier among tight values
    vals = [10.0 + 0.01 * i for i in range(50)] + [500.0]
    rows = [(i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
             1, "buy", v) for i, v in enumerate(vals)]
    out = anomaly_zscore(_events(spark, rows)).collect()
    ids = {r.event_id for r in out}

    # float reference (population std)
    import statistics
    mu = statistics.fmean(vals)
    sigma = statistics.pstdev(vals)
    expect = {i for i, v in enumerate(vals) if abs(v - mu) > 3 * sigma}
    assert ids == expect and 50 in ids


def test_anomaly_constant_type_has_no_outliers(spark):
    rows = [(i, dt.datetime(2024, 1, 1), 1, "ping", 5.0) for i in range(10)]
    assert anomaly_zscore(_events(spark, rows)).count() == 0
