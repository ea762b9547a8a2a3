#!/usr/bin/env python3
"""Probe-tier × multi-JVM-tier marriage (round 11, VERDICT r10 item 6).

Round 10 ran the heavy dedup chains at 25× on real executor JVMs and
the 125–625× tiers on local[32] threads — never both at once.  The
cliff class the 625× tier found (static shuffle width, GC-deferred
shuffle cleanup, page-cache regime shifts) behaves differently with
per-executor disk and netty transport, so this tool runs ANY
registered query (or the exact/sketch LSH pair) at a chosen replica
multiplier under ``SPARK_GRAFT_MASTER`` (e.g.
``local-cluster[4,6,5120]``) and reports, per run:

  * wall seconds and output rows (via the count-aggregate idiom);
  * total shuffle bytes/records written from the executed plan's
    exchange metrics (netty-transported on local-cluster) — NOTE:
    for the iterative chains (CC/LPA/PageRank) this covers only the
    FINAL DataFrame's execution; each checkpointed round ran as its
    own execution, so wall + per-executor RSS are the load-bearing
    numbers there and the shuffle figure is a floor;
  * PER-EXECUTOR PEAK RSS, sampled from /proc for every
    CoarseGrainedExecutorBackend child the cluster spawns, plus the
    driver JVM's peak — the distribution evidence a real cluster
    cares about (state must live in executors, driver stays flat).

    SPARK_GRAFT_MASTER='local-cluster[4,6,5120]' \
      python tools/cluster_probe.py --query docs_leakage_safe_split --mult 125

Output: one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grpc_map_reduce_spark import get_spark, registry  # noqa: E402
from tools.sketch_probe import shuffle_totals  # noqa: E402


def _jvm_procs() -> dict[int, str]:
    """pid -> 'executor' | 'driver' for this user's live Spark JVMs."""
    out: dict[int, str] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read().decode("utf-8", "replace")
        except OSError:
            continue
        if "CoarseGrainedExecutorBackend" in cmd:
            out[int(pid)] = "executor"
        elif "java" in cmd and ("pyspark-shell" in cmd
                                or "org.apache.spark.deploy" in cmd):
            out[int(pid)] = "driver"
    return out


def _rss_mb(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as fh:
            for line in fh:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) // 1024
    except OSError:
        pass
    return 0


class RssSampler(threading.Thread):
    """Background /proc sampler: per-PID peak RSS while a query runs."""

    def __init__(self, interval: float = 0.5):
        super().__init__(daemon=True)
        self.interval = interval
        self.peaks: dict[int, int] = {}
        self.roles: dict[int, str] = {}
        self._halt = threading.Event()  # NB: Thread._stop() exists — don't shadow it

    def run(self) -> None:
        while not self._halt.is_set():
            for pid, role in _jvm_procs().items():
                self.roles[pid] = role
                rss = _rss_mb(pid)
                if rss > self.peaks.get(pid, 0):
                    self.peaks[pid] = rss
            self._halt.wait(self.interval)

    def stop(self) -> dict[str, object]:
        self._halt.set()
        self.join(timeout=5)
        execs = sorted(mb for pid, mb in self.peaks.items()
                       if self.roles.get(pid) == "executor")
        driver = max((mb for pid, mb in self.peaks.items()
                      if self.roles.get(pid) == "driver"), default=0)
        return {"executor_peak_rss_mb": execs,
                "driver_peak_rss_mb": driver}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", required=True,
                    help="registered query name, or lsh_exact / lsh_sketch")
    ap.add_argument("--mult", type=int, default=125)
    ap.add_argument("--threshold", type=float, default=None)
    args = ap.parse_args()

    master = os.environ.get("SPARK_GRAFT_MASTER", "")
    spark = get_spark("cluster-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from tools.scaling_probe import synthesize

    sf_dir = synthesize(spark, args.mult)

    from pyspark.sql import functions as F

    # session/scan warm-up outside the timed region (executor launch
    # on local-cluster is seconds, not milliseconds)
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(
        100
    ).groupBy().count().collect()

    # Query CONSTRUCTION goes inside the timed+sampled region: the
    # iterative chains (CC/LPA/PageRank/leakage split) run their
    # heavy work EAGERLY during plan build (eager localCheckpoint per
    # round), so timing only the final count would measure a cached
    # result — same discipline as scaling_probe's timing window.
    sampler = RssSampler()
    sampler.start()
    t0 = time.perf_counter()
    if args.query in ("lsh_exact", "lsh_sketch"):
        from grpc_map_reduce_spark.operators.dedup import (
            lsh_near_dup,
            lsh_near_dup_sketch,
        )

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        kw = {} if args.threshold is None else {"threshold": args.threshold}
        fn = lsh_near_dup if args.query == "lsh_exact" else lsh_near_dup_sketch
        out = fn(docs, **kw)
    else:
        out = registry.all_queries()[args.query].spark_fn(spark, sf_dir)
    wrapped = out.groupBy().agg(F.count("*").alias("n"))
    n_rows = wrapped.collect()[0]["n"]
    wall = round(time.perf_counter() - t0, 3)
    rss = sampler.stop()

    rec = {
        "query": args.query, "mult": args.mult, "master": master,
        "sec": wall, "rows": n_rows,
    }
    rec.update(shuffle_totals(wrapped))
    rec["shuffle_gb_written"] = round(rec["shuffle_bytes_written"] / 1e9, 2)
    rec.update(rss)
    print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
