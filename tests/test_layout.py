"""Plan-level guarantees of the storage-layout helpers: bucketed
joins run with zero exchanges; date-partitioned reads prune
directories at planning time."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grpc_map_reduce_spark.plans.audit import explain_str
from grpc_map_reduce_spark.sources.layout import (
    bucketed_join,
    write_bucketed,
    write_date_partitioned,
)
from grpc_map_reduce_spark.sources.tables import table


@pytest.fixture()
def no_auto_broadcast(spark):
    # the fixture dims are tiny, so the planner would broadcast and
    # never exercise the bucketed path this test is about
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, sf_dir, no_auto_broadcast):
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity")
    )
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(li, "b_lineitem", "o_orderkey", n_buckets=8)
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = explain_str(joined)
        assert "Exchange" not in plan, f"bucketed join must not shuffle\n{plan}"
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # correctness: same rows as the plain join
        want = orders.join(li, "o_orderkey").count()
        assert joined.count() == want
        # aggregation on the bucket key also skips its shuffle
        agg_plan = explain_str(
            spark.table("b_lineitem").groupBy("o_orderkey").agg(F.sum("l_quantity"))
        )
        assert "Exchange" not in agg_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_date_partitioned_scan_prunes(spark, sf_dir, tmp_path):
    orders = table(spark, sf_dir, "orders").withColumn(
        "o_date", F.to_date("o_orderdate")
    )
    path = str(tmp_path / "orders_by_date")
    write_date_partitioned(orders.filter(F.col("o_orderdate") < F.lit("1995-03-01")), path, "o_date")

    back = spark.read.parquet(path)
    pruned = back.filter(F.col("o_date") == F.lit("1995-01-15"))
    plan = explain_str(pruned)
    assert "PartitionFilters" in plan and "o_date" in plan
    # partition values survive the directory round trip
    got = pruned.count()
    want = orders.filter(F.col("o_date") == F.lit("1995-01-15")).count()
    assert got == want > 0


def test_zorder_layout_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordered files cover small (custkey, orderkey) rectangles, so
    parquet min/max stats prune files for a predicate on EITHER
    column.  Baseline: a linear sort by custkey makes every file span
    the full orderkey range — an orderkey-only predicate prunes
    nothing there."""
    import pyarrow.parquet as pq
    from grpc_map_reduce_spark.sources.layout import write_zordered

    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lo_k, hi_k, lo_c, hi_c = orders.agg(
        F.min("o_orderkey"), F.max("o_orderkey"),
        F.min("o_custkey"), F.max("o_custkey"),
    ).first()

    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zordered(orders, zpath, ["o_custkey", "o_orderkey"], n_files=16)
    (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite").parquet(lpath)
    )

    def overlapping_files(path, col, lo, hi):
        """Files whose [min,max] stats on `col` intersect [lo, hi] —
        exactly the files a stats-driven scan must read."""
        import glob
        n_total, n_hit = 0, 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            fmin = min(md.row_group(i).column(idx).statistics.min
                       for i in range(md.num_row_groups))
            fmax = max(md.row_group(i).column(idx).statistics.max
                       for i in range(md.num_row_groups))
            n_total += 1
            if fmax >= lo and fmin <= hi:
                n_hit += 1
        return n_hit, n_total

    # narrow predicate on orderkey only (1/8 of the range)
    w = (hi_k - lo_k) // 8
    z_hit, z_total = overlapping_files(zpath, "o_orderkey", lo_k, lo_k + w)
    l_hit, l_total = overlapping_files(lpath, "o_orderkey", lo_k, lo_k + w)
    assert l_hit == l_total, "custkey-sorted layout cannot prune on orderkey"
    assert z_hit <= z_total // 2, (
        f"z-order should skip most files on the non-sort column: "
        f"{z_hit}/{z_total}"
    )
    # ...and it still prunes on custkey too (no dimension is sacrificed)
    wc = (hi_c - lo_c) // 8
    zc_hit, zc_total = overlapping_files(zpath, "o_custkey", lo_c, lo_c + wc)
    assert zc_hit <= zc_total // 2, f"{zc_hit}/{zc_total}"
    # round-trip integrity
    assert spark.read.parquet(zpath).count() == orders.count()


def test_upsert_rewrites_only_touched_partitions(spark, sf_dir, tmp_path):
    """Partition-granular MERGE: an update delta for one day must
    (a) replace that day's rows for matching keys, (b) append new
    keys, and (c) leave every other day's files byte-identical."""
    import os
    from grpc_map_reduce_spark.sources.layout import upsert_date_partitions

    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "value", F.to_date("ts").alias("day"))
    )
    path = str(tmp_path / "events_by_day")
    ev.write.partitionBy("day").parquet(path)

    days = sorted(r[0] for r in ev.select("day").distinct().collect())
    target_day, other_day = days[0], days[-1]

    def snapshot(day):
        d = f"{path}/day={day}"
        return {f: os.path.getmtime(f"{d}/{f}") for f in os.listdir(d)
                if f.endswith(".parquet")}

    before_other = snapshot(other_day)
    one = ev.filter(F.col("day") == target_day).first()
    updates = spark.createDataFrame(
        [(one["event_id"], one["user_id"], 999.5, target_day),
         (10_000_000, 42, 1.25, target_day)],
        schema="event_id long, user_id long, value double, day date",
    )
    upsert_date_partitions(spark, path, updates, "day", "event_id")

    # untouched partition: exact same files, same mtimes
    assert snapshot(other_day) == before_other
    after = spark.read.parquet(path)
    # updated row replaced, new row present, total count = old + 1
    assert after.filter(F.col("event_id") == one["event_id"]) \
                .select("value").first()[0] == 999.5
    assert after.filter(F.col("event_id") == 10_000_000).count() == 1
    assert after.count() == ev.count() + 1


def test_compact_merges_small_files_value_identical(spark, sf_dir, tmp_path):
    """64 tiny files → a handful, content identical."""
    from grpc_map_reduce_spark.sources.layout import compact

    orders = table(spark, sf_dir, "orders")
    path = str(tmp_path / "frag")
    orders.repartition(64).write.parquet(path)
    want = sorted(tuple(r) for r in orders.collect())

    before, after = compact(spark, path, target_bytes=4 * 1024 * 1024)
    assert before == 64
    assert after < 8, f"compaction left {after} files"
    got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert got == want
