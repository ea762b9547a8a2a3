from __future__ import annotations

import os

import duckdb
import pytest

from grpc_map_reduce_spark import get_spark
from grpc_map_reduce_spark.sources.tables import TABLE_NAMES

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (round 12, VERDICT r11 item 5): the full suite's
    ~28-30 min wall exceeded the driver's verify window, silently
    degrading the independent test gate to "trust the builder's log"
    (VERIFY_r11 ``tests_ok: false`` with zero failures, cut off
    mid-suite).  Tests marked ``slow`` (multi-JVM pseudo-cluster
    parity/loss gates, full-inventory harness runs) are skipped unless
    ``SPARK_GRAFT_SLOW_TESTS=1`` — the builder runs both tiers; the
    driver's default ``pytest tests/`` run gets a core tier that
    finishes inside its window."""
    if os.environ.get("SPARK_GRAFT_SLOW_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow tier: set SPARK_GRAFT_SLOW_TESTS=1 to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    s = get_spark(
        "grpc-map-reduce-spark-tests",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"),
        extra_conf={
            # keep catalog-table files (bucketing tests) out of the repo
            "spark.sql.warehouse.dir": str(tmp_path_factory.mktemp("warehouse")),
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(rows, colnames):
    """Order-insensitive, name-sorted canonical form (mimics the
    driver's compare: sort columns by name, then hash values)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon = []
    for row in rows:
        canon.append(tuple(_canon_value(row[i]) for i in order))
    return sorted(colnames), sorted(canon, key=repr)


def _canon_value(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Queries round explicitly; this only absorbs repr noise.
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_canon_value(x) for x in v)
    return v


def assert_matches_oracle(spark, duck, sf_dir, name):
    """Run registry query `name` on Spark and its DuckDB oracle; compare."""
    from grpc_map_reduce_spark import registry

    q = registry.all_queries()[name]
    sdf = q.spark_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = duck.execute(q.oracle)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    s_names, s_canon = normalize(s_rows, s_cols)
    d_names, d_canon = normalize(d_rows, d_cols)
    assert s_names == d_names, f"{name}: column names differ: {s_names} vs {d_names}"
    assert len(s_canon) == len(d_canon), (
        f"{name}: row count differs: spark={len(s_canon)} duckdb={len(d_canon)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_canon, d_canon) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 5: {mismatches[:5]}"
    )
