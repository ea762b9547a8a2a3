#!/usr/bin/env python3
"""Layout operators at volume (VERDICT r7 item 7).

`write_zordered` / `compact` / `write_date_partitioned` were
plan/behavior-tested at fixture scale only; this probe measures the
claims at replicated volume (default 25x sf0.1 lineitem, ~1.5 M rows):

  * z-order file skipping — write the same table twice (z-ordered on
    (l_partkey, l_suppkey) vs. plain single-column-clustered), read
    every output file's parquet footer, and count the files a
    min/max-pruning reader skips for a selective predicate on EACH
    z-column.  The z-layout must let BOTH dimensions skip; the linear
    layout only its sort column.  Footer stats are exactly what a
    table format's file-level pruning (and Spark's row-group pruning)
    consume, so the count is the layout property itself, not a proxy.
  * scan wall-clock under the same pushed predicate on each layout
    (row-group pruning is what a plain-parquet Spark scan actually
    exploits).
  * compact() — fragment the table into many small files, compact,
    report file counts and the full-scan time before/after.

Usage: python tools/layout_probe.py [--mult 25]
Prints one JSON line per measurement, then a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grpc_map_reduce_spark import get_spark
from grpc_map_reduce_spark.sources.layout import compact, write_zordered

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch", "layoutprobe",
)


def _file_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-file (min, max) of each column from the parquet footers."""
    import glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        rec: dict = {"file": os.path.basename(f)}
        for c in cols:
            lo = hi = None
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx[c]).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            rec[c] = (lo, hi)
        out.append(rec)
    return out


def _skippable(stats: list[dict], col: str, lo: float, hi: float) -> int:
    """Files whose footer bounds exclude [lo, hi] — what a min/max
    pruning reader never opens."""
    return sum(1 for r in stats if r[col][1] < lo or r[col][0] > hi)


def _timed_count(spark, path: str, pred) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = spark.read.parquet(path).filter(pred).count()
    return round(time.perf_counter() - t0, 3), n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=25)
    ap.add_argument("--n-files", type=int, default=64)
    args = ap.parse_args()

    from tools.scaling_probe import synthesize

    spark = get_spark("layout-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = synthesize(spark, args.mult)
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    n_rows = li.count()
    print(json.dumps({"mult": args.mult, "rows": n_rows}), flush=True)

    from pyspark.sql import functions as F

    zcols = ["l_partkey", "l_suppkey"]
    shutil.rmtree(SCRATCH, ignore_errors=True)
    zpath = os.path.join(SCRATCH, "z")
    lpath = os.path.join(SCRATCH, "linear")

    t0 = time.perf_counter()
    write_zordered(li, zpath, zcols, n_files=args.n_files)
    t_z = round(time.perf_counter() - t0, 3)
    # baseline: same file count, clustered on the FIRST column only
    t0 = time.perf_counter()
    (li.repartitionByRange(args.n_files, "l_partkey")
       .sortWithinPartitions("l_partkey")
       .write.mode("overwrite").parquet(lpath))
    t_l = round(time.perf_counter() - t0, 3)
    print(json.dumps({"write_zordered_s": t_z, "write_linear_s": t_l}),
          flush=True)

    zstats = _file_stats(zpath, zcols)
    lstats = _file_stats(lpath, zcols)
    # a ~1%-of-domain slice on each dimension
    bounds = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    pk_lo, pk_hi = bounds[0], bounds[1]
    sk_lo, sk_hi = bounds[2], bounds[3]
    pk_a = pk_lo + (pk_hi - pk_lo) // 2
    pk_b = pk_a + max(1, (pk_hi - pk_lo) // 100)
    sk_a = sk_lo + (sk_hi - sk_lo) // 2
    sk_b = sk_a + max(1, (sk_hi - sk_lo) // 100)

    summary = {"n_files": args.n_files}
    for label, stats, path in (("zorder", zstats, zpath),
                               ("linear", lstats, lpath)):
        skip_pk = _skippable(stats, "l_partkey", pk_a, pk_b)
        skip_sk = _skippable(stats, "l_suppkey", sk_a, sk_b)
        t_pk, n_pk = _timed_count(
            spark, path, F.col("l_partkey").between(pk_a, pk_b))
        t_sk, n_sk = _timed_count(
            spark, path, F.col("l_suppkey").between(sk_a, sk_b))
        row = {
            "layout": label,
            "files_skipped_l_partkey": skip_pk,
            "files_skipped_l_suppkey": skip_sk,
            "scan_s_l_partkey": t_pk, "scan_s_l_suppkey": t_sk,
            "rows_l_partkey": n_pk, "rows_l_suppkey": n_sk,
        }
        summary[label] = row
        print(json.dumps(row), flush=True)

    # both layouts must return identical row counts (layout is a
    # physical property, never a semantic one)
    assert summary["zorder"]["rows_l_partkey"] \
        == summary["linear"]["rows_l_partkey"]
    assert summary["zorder"]["rows_l_suppkey"] \
        == summary["linear"]["rows_l_suppkey"]

    # ---- compaction at volume -------------------------------------
    frag = os.path.join(SCRATCH, "frag")
    li.repartition(400).write.mode("overwrite").parquet(frag)
    t_before, _ = _timed_count(spark, frag, F.lit(True))
    t0 = time.perf_counter()
    before, after = compact(spark, frag, target_bytes=64 * 1024 * 1024)
    t_compact = round(time.perf_counter() - t0, 3)
    t_after, _ = _timed_count(spark, frag, F.lit(True))
    row = {"compact_files_before": before, "compact_files_after": after,
           "compact_s": t_compact,
           "full_scan_s_before": t_before, "full_scan_s_after": t_after}
    summary["compact"] = row
    print(json.dumps(row), flush=True)
    print(json.dumps({"layout_probe_summary": summary}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
