"""The approximate scale path next to its exact twin.

Exact COUNT(DISTINCT) and exact percentiles are fine at test SF but
become the shuffle bottleneck at 100 TB; the production swap is
``approx_count_distinct`` (HyperLogLog++, mergeable, one pass) and
``approx_percentile`` (t-digest-style sketch).  These are
engine-specific estimators — no DuckDB oracle can hash-match them —
so the gate here is a relative-error bound against the exact
operators on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from grpc_map_reduce_spark.sources.tables import table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).first()
    rel_err = abs(row["approx"] - row["exact"]) / row["exact"]
    assert rel_err < 0.05, f"HLL rel err {rel_err:.4f} (exact={row['exact']})"


def test_approx_percentile_close_to_exact(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    row = orders.agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("exact_p50"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10_000)).alias("approx_p50"),
        F.percentile("o_totalprice", F.lit(0.99)).alias("exact_p99"),
        F.percentile_approx("o_totalprice", F.lit(0.99), F.lit(10_000)).alias("approx_p99"),
    ).first()
    for q in ("p50", "p99"):
        rel_err = abs(row[f"approx_{q}"] - row[f"exact_{q}"]) / row[f"exact_{q}"]
        assert rel_err < 0.02, f"{q} rel err {rel_err:.4f}"


def test_approx_grouped_matches_exact_groups(spark, sf_dir):
    # grouped HLL: every group's estimate lands within the bound,
    # and the approximate plan is partial+final (mergeable sketches),
    # not an expand like exact distinct
    li = table(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("exact"),
            F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / max(r["exact"], 1) < 0.05


def test_hll_profile_error_within_3_sigma(spark, sf_dir):
    from grpc_map_reduce_spark.operators.sketches import (
        APPROX_RSD,
        hll_distinct_profile,
    )

    rows = hll_distinct_profile(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_exact"] > 0
        rel_err = abs(r["n_approx"] - r["n_exact"]) / r["n_exact"]
        assert rel_err <= 3 * APPROX_RSD, (
            f"{r['table_name']}.{r['column_name']}: rel err {rel_err:.4f}"
        )
        assert r["err_bp"] == int(
            abs(r["n_approx"] - r["n_exact"]) * 10000 // r["n_exact"]
        )


def test_gk_quantiles_within_rank_error(spark, sf_dir):
    import duckdb

    from grpc_map_reduce_spark.operators.sketches import (
        QUANTILE_ACCURACY,
        gk_quantiles_profile,
    )

    rows = gk_quantiles_profile(spark, sf_dir).collect()
    assert len(rows) == 5
    values = sorted(
        r[0] for r in duckdb.sql(
            f"SELECT o_totalprice FROM read_parquet('{sf_dir}/orders.parquet')"
        ).fetchall()
    )
    n = len(values)
    for r in rows:
        # GK contract: the approx value's RANK is within n/accuracy of
        # the target rank
        import bisect

        target = r["quantile"] * (n - 1)
        lo = bisect.bisect_left(values, r["approx_value"] - 0.01)
        hi = bisect.bisect_right(values, r["approx_value"] + 0.01)
        err = min(abs(lo - target), abs(hi - target))
        assert err <= n / QUANTILE_ACCURACY + 1, (r, err, n)
        assert abs(r["exact_value"] - values[int(target)]) <= max(
            0.02, abs(values[min(int(target) + 1, n - 1)] - values[int(target)])
        )
