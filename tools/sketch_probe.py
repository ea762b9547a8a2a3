#!/usr/bin/env python3
"""Exact-rescore vs sketch-rescore comparison at probe scale
(round 11, VERDICT r10 item 1).

The exact LSH near-dup path ships each candidate pair's two
shingle-hash arrays through the rescore shuffle — measured ~46 GB at
the 625x tier (109 M candidates, SURVEY §8.11).  The sketch path
(`lsh_near_dup_sketch`) scores the same candidates from the MinHash
signature agreement the candidate stream already carries, so the
rescore becomes a filter on the candidate aggregate and that
transport should go to ~zero.  This probe makes the claim a number:
for each path it runs the guarded production chain on the replicated
corpus in a FRESH session (probe-tier discipline: session reuse
contaminates disk-heavy tiers — SURVEY §8.11) and reports wall,
TOTAL SHUFFLE BYTES WRITTEN summed over the executed plan's exchange
nodes, records shuffled, output rows, and peak heap.

Run one path per process so neither inherits the other's page-cache
or shuffle-dir state:

    python tools/sketch_probe.py --path exact  --mult 625
    python tools/sketch_probe.py --path sketch --mult 625

Output: one JSON line per run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grpc_map_reduce_spark import get_spark  # noqa: E402
from grpc_map_reduce_spark.plans.runtime_witness import (  # noqa: E402
    iter_executed_nodes,
    node_metrics,
)


def shuffle_totals(df) -> dict[str, int]:
    """Sum shuffle write metrics over the executed plan, deduped by
    node id (ReusedExchange descends into the SAME exchange node —
    counting it twice would overstate the transport)."""
    seen: set[int] = set()
    bytes_written = records = data_size = 0
    for node in iter_executed_nodes(df._jdf.queryExecution().executedPlan()):
        nid = node.id()
        if nid in seen:
            continue
        seen.add(nid)
        if "ShuffleExchange" not in node.getClass().getSimpleName():
            continue
        m = node_metrics(node)
        bytes_written += m.get("shuffleBytesWritten", 0)
        records += m.get("shuffleRecordsWritten", 0)
        data_size += m.get("dataSize", 0)
    return {"shuffle_bytes_written": int(bytes_written),
            "shuffle_records_written": int(records),
            "shuffle_data_size": int(data_size)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", choices=["exact", "sketch", "auto"],
                    required=True)
    ap.add_argument("--mult", type=int, default=625)
    ap.add_argument("--driver-memory", default="8g")
    ap.add_argument("--threshold", type=float, default=None,
                    help="score threshold (default: each path's own)")
    ap.add_argument("--conf", action="append", default=[],
                    help="extra spark conf k=v (repeatable) — e.g. "
                         "spark.io.compression.codec=zstd for the "
                         "disk-envelope experiments (guide §2.3)")
    args = ap.parse_args()

    from tools.scaling_probe import synthesize

    extra = {"spark.driver.memory": args.driver_memory}
    for kv in args.conf:
        k, v = kv.split("=", 1)
        extra[k] = v
    spark = get_spark("sketch-probe", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm
    heap_max_mb = round(
        jvm.java.lang.Runtime.getRuntime().maxMemory() / (1024 * 1024))

    sf_dir = synthesize(spark, args.mult)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    from grpc_map_reduce_spark.operators.dedup import (
        lsh_near_dup,
        lsh_near_dup_auto,
        lsh_near_dup_sketch,
    )

    # Wrap in a count aggregate and collect THAT df: collect()
    # executes the df's own QueryExecution, so its executed plan (and
    # every exchange's metrics) stays reachable — the same idiom as
    # plans/runtime_witness.py.  (A noop write or .count() would run
    # a separate QueryExecution whose metrics we can't reach.)
    # Construction is INSIDE the timer: lazy for exact/sketch (~ms),
    # but the auto path's planner census runs a real job at build
    # time and its cost belongs in the measured wall.
    from pyspark.sql import functions as F

    kw = {} if args.threshold is None else {"threshold": args.threshold}
    t0 = time.perf_counter()
    decision: list = []
    if args.path == "exact":
        out = lsh_near_dup(docs, **kw)  # guard ON (production default)
    elif args.path == "sketch":
        out = lsh_near_dup_sketch(docs, **kw)
    else:
        # guard ON, planner decides; the decision hook reports the
        # branch even when the chosen path returns zero rows
        out = lsh_near_dup_auto(docs, decision=decision, **kw)
    out = out.groupBy().agg(F.count("*").alias("n"))
    row = out.collect()[0]
    wall = round(time.perf_counter() - t0, 3)
    n_rows = row["n"]
    used_sketch = decision[0] if decision else None

    rec = {
        "path": args.path, "mult": args.mult,
        "threshold": args.threshold, "sec": wall, "rows": n_rows,
        "heap_max_mb": heap_max_mb,
    }
    if args.path == "auto":
        # shuffle totals below cover only the FINAL execution (the
        # planner census ran as its own job) — wall is the
        # load-bearing number; the branch taken is the finding.
        rec["used_sketch"] = used_sketch
    rec.update(shuffle_totals(out))
    rec["shuffle_gb_written"] = round(
        rec["shuffle_bytes_written"] / 1e9, 2)
    print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
