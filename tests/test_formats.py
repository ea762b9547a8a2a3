"""CSV / JSONL interchange round-trips: parquet → text format → back,
value-identical, with explicit schemas (no inference pass)."""

from __future__ import annotations

from pyspark.sql import functions as F

from grpc_map_reduce_spark.sources.formats import (
    read_csv,
    read_jsonl,
    to_parquet,
    write_csv,
    write_jsonl,
)
from grpc_map_reduce_spark.sources.tables import table

CUSTOMER_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey int, "
    "c_acctbal double, c_mktsegment string"
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip_value_identical(spark, sf_dir, tmp_path):
    cust = table(spark, sf_dir, "customer")
    write_csv(cust, str(tmp_path / "csv"))
    back = read_csv(spark, str(tmp_path / "csv"), CUSTOMER_SCHEMA)
    assert back.schema == cust.schema
    assert _rows(back) == _rows(cust)


def test_jsonl_roundtrip_value_identical(spark, sf_dir, tmp_path):
    cust = table(spark, sf_dir, "customer")
    write_jsonl(cust, str(tmp_path / "jsonl"))
    back = read_jsonl(spark, str(tmp_path / "jsonl"), CUSTOMER_SCHEMA)
    assert _rows(back.select(*cust.columns)) == _rows(cust)


def test_landed_parquet_gets_pushdown_csv_does_not(spark, sf_dir, tmp_path):
    """The reason to_parquet is stage one: the same filter reaches the
    parquet scan as a pushed row-group filter, while the CSV scan
    parses everything."""
    cust = table(spark, sf_dir, "customer")
    write_csv(cust, str(tmp_path / "csv"))
    csv_df = read_csv(spark, str(tmp_path / "csv"), CUSTOMER_SCHEMA)
    to_parquet(csv_df, str(tmp_path / "pq"))
    pq_df = spark.read.parquet(str(tmp_path / "pq"))

    pq_plan = pq_df.filter(F.col("c_custkey") == 7)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,7)]" in pq_plan
    # and the landed parquet is value-identical to the source
    assert _rows(pq_df) == _rows(cust)


def test_partitioned_landing_prunes_directories(spark, sf_dir, tmp_path):
    cust = table(spark, sf_dir, "customer")
    to_parquet(cust, str(tmp_path / "bynation"), partition_by=["c_nationkey"])
    df = spark.read.parquet(str(tmp_path / "bynation"))
    plan = df.filter(F.col("c_nationkey") == 3)._jdf.queryExecution() \
        .executedPlan().toString()
    # the nation filter prunes whole directories, not row groups
    assert "PartitionFilters: [isnotnull(c_nationkey" in plan
    got = df.filter(F.col("c_nationkey") == 3).count()
    want = cust.filter(F.col("c_nationkey") == 3).count()
    assert got == want > 0


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC round-trips value-identical with no DDL needed, and — being
    columnar with stats — gets predicate pushdown like parquet."""
    from grpc_map_reduce_spark.plans.audit import explain_str
    from grpc_map_reduce_spark.sources.formats import read_orc, write_orc

    cust = table(spark, sf_dir, "customer")
    write_orc(cust, str(tmp_path / "orc"))
    back = read_orc(spark, str(tmp_path / "orc"))
    assert back.schema == cust.schema
    assert _rows(back) == _rows(cust)
    plan = explain_str(back.filter(F.col("c_custkey") == 42))
    assert "PushedFilters" in plan and "EqualTo(c_custkey,42)" in plan
