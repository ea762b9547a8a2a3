"""Partitioning-invariance: operator OUTPUT must be a pure function
of the input DATA, never of its physical layout.  At 100 TB the
partition count is picked by the planner/AQE and changes run to run —
any operator whose result depends on it is broken at scale even if
every fixture test passes.

The interesting cases are the operators with per-partition internal
state (the Misra-Gries sketch's candidate set genuinely differs per
layout — only the final output is guaranteed), per-partition Arrow
batches (LSH signatures), and window/sort paths (sessionize).
"""

from __future__ import annotations

import pytest

from grpc_map_reduce_spark.sources.tables import table


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("parts", [1, 7, 31])
def test_heavy_hitters_layout_invariant(spark, sf_dir, parts):
    from grpc_map_reduce_spark.operators.sketches import heavy_hitters

    docs = table(spark, sf_dir, "documents")
    base = _rows(heavy_hitters(docs, inv_phi=50))
    assert base  # non-vacuous at inv_phi=50
    assert _rows(heavy_hitters(docs.repartition(parts), inv_phi=50)) == base


@pytest.mark.parametrize("parts", [1, 13])
def test_lsh_neardup_layout_invariant(spark, sf_dir, parts):
    from grpc_map_reduce_spark.operators.dedup import lsh_near_dup

    docs = table(spark, sf_dir, "documents")
    base = _rows(lsh_near_dup(docs).select("doc_a", "doc_b"))
    got = _rows(
        lsh_near_dup(docs.repartition(parts)).select("doc_a", "doc_b")
    )
    assert got == base


@pytest.mark.parametrize("parts", [1, 13])
def test_sessionize_layout_invariant(spark, sf_dir, parts):
    from grpc_map_reduce_spark.operators.events import sessionize

    ev = table(spark, sf_dir, "events")
    base = _rows(sessionize(ev))
    assert _rows(sessionize(ev.repartition(parts))) == base


def test_spread_is_noop_when_scan_is_wide_enough(spark, sf_dir):
    """spread() must insert its round-robin ONLY for split-starved
    scans: on an input already carrying >= defaultParallelism
    partitions it must return the frame untouched (identity), because
    at production scale that exchange would be a full-corpus shuffle
    for nothing."""
    from grpc_map_reduce_spark.sources.tables import spread

    p = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000).repartition(p + 4)
    assert spread(wide) is wide

    narrow = table(spark, sf_dir, "documents")  # single-row-group file
    assert narrow.rdd.getNumPartitions() < p
    out = spread(narrow)
    assert out is not narrow
    assert out.rdd.getNumPartitions() == p
    # same rows either way
    assert sorted(r.doc_id for r in out.select("doc_id").collect()) == \
        sorted(r.doc_id for r in narrow.select("doc_id").collect())
