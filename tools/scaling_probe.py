#!/usr/bin/env python3
"""Empirical scale-up probe: run headline operators at 1x / 5x / 25x
the sf0.1 fixture volume and report wall-clock scaling factors.

The fixtures top out at sf0.1, which cannot distinguish "scales
linearly" from "happens to fit"; this probe synthesizes larger
corpora by REPLICATING the sf0.1 tables with shifted primary keys
(doc_id += k*10^9, orderkey += k*10^9) — content distribution is
preserved, volume multiplies, and near-dup structure replicates
per-shard so LSH candidate counts grow linearly, not quadratically.

Probed claims (each maps to a SURVEY §8 scale assertion):
  * wordcount            — map + one agg: must scale ~linearly
  * heavy_hitters        — MG sketch + recount: ~linear, candidate
                           set bounded by partitions/phi
  * dedup_lsh_neardup    — sub-quadratic LSH: ~linear in docs
                           (the all-pairs formulation would be 25x^2)
  * q1_pricing_summary   — full lineitem agg: ~linear
  * pagerank_neardup     — fixed-K power iteration over LSH edges:
                           ~linear in edges (loop-invariant edge table
                           partitioned once, only ranks move)
  * dedup_triangles      — canonical wedge join + closure probe:
                           wedge count is bounded by Σ deg², which
                           replication grows linearly (cliques don't
                           span replicas)
  * orders_market_basket — apriori-gated pair self-join: bounded by
                           Σ basket², baskets replicate unchanged
  * phrase_search        — pruned posting-list adjacency join:
                           ~linear in postings of the probe phrase

Usage: python tools/scaling_probe.py [--mults 1,5,25]
Writes scratch parquet under .scratch/scaleprobe/ (gitignored) and
prints one JSON line per (query, mult) plus a scaling summary.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grpc_map_reduce_spark import get_spark, registry

BASE_SF = "/root/testdata/sf0.1"
SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch", "scaleprobe",
)
PROBES = ["wordcount", "heavy_hitters", "dedup_lsh_neardup",
          "q1_pricing_summary", "dedup_canonical", "docs_lang_id",
          # iterative/graph family (VERDICT r4 item 4): the shapes
          # whose super-linear risk was argued in comments but never
          # measured
          "pagerank_neardup", "dedup_triangles", "orders_market_basket",
          "phrase_search",
          # round-5 additions with non-obvious scaling: the LPA loop
          # (label joins per round), the KMV pair probe (sketch-sized
          # by construction — should be FLAT), and the composed
          # three-rule attribution (windows + the full LSH chain)
          "dedup_communities_lpa", "source_overlap_kmv",
          "dedup_rule_attribution"]
#: key column to shift per replica so replicated rows stay distinct
KEYED = {
    "documents": "doc_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
}
SHIFT = 10**9


#: per-replica character rotation applied to documents.text so a
#: replicated doc is NOT a shingle-level near-dup of its source —
#: without this, replication builds m-clone cliques whose LSH
#: candidate pairs grow O(m²) and the probe measures clique blowup,
#: not corpus growth.  The rotation must be DISTINCT for every
#: replica: an earlier 5-vowel rotation collided at mult=25 (5 exact
#: clones per rotation class → 5× cluster inflation → the wedge join
#: measured 93× at 25× data, a probe artifact the full-alphabet
#: rotation eliminates).  A bijective char map preserves each
#: replica's INTERNAL near-dup structure exactly while making
#: cross-replica shingle collisions vanish.
ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def _rot(k: int) -> str:
    return ALPHABET[k % 26:] + ALPHABET[:k % 26]


def synthesize(spark, mult: int) -> str:
    out = os.path.join(SCRATCH, f"x{mult}")
    done = os.path.join(out, "_COMPLETE")
    if os.path.exists(done):
        return out
    shutil.rmtree(out, ignore_errors=True)  # partial prior attempt
    os.makedirs(out, exist_ok=True)
    from pyspark.sql import functions as F

    for tbl in ("region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings"):
        src = spark.read.parquet(os.path.join(BASE_SF, f"{tbl}.parquet"))
        if tbl in KEYED and mult > 1:
            key = KEYED[tbl]
            reps = []
            for k in range(mult):
                r = src.withColumn(key, F.col(key) + F.lit(k * SHIFT))
                if tbl == "documents" and k:
                    r = r.withColumn(
                        "text", F.translate("text", ALPHABET, _rot(k))
                    )
                reps.append(r)
            df = reps[0]
            for r in reps[1:]:
                df = df.unionByName(r)
        else:
            df = src
        df.write.mode("overwrite").parquet(os.path.join(out, f"{tbl}.parquet"))
    open(done, "w").close()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", default="1,5,25")
    ap.add_argument("--clean", action="store_true",
                    help="remove scratch data and exit")
    args = ap.parse_args()
    if args.clean:
        shutil.rmtree(SCRATCH, ignore_errors=True)
        return
    mults = [int(m) for m in args.mults.split(",")]

    # local-mode JVM defaults to a 1 GiB heap — fine for sf0.1, OOM
    # for the 25x union write.  The probe is exactly the situation
    # where heap should scale with data volume.
    spark = get_spark(
        "scaling-probe", extra_conf={"spark.driver.memory": "16g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    # absorb session/scan warmup outside the x1 timings
    qs[PROBES[0]].spark_fn(spark, BASE_SF).write.format("noop").mode(
        "overwrite"
    ).save()
    results: dict[str, dict[int, float]] = {q: {} for q in PROBES}
    for mult in mults:
        sf_dir = synthesize(spark, mult)
        for name in PROBES:
            t0 = time.perf_counter()
            qs[name].spark_fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            results[name][mult] = dt
            print(json.dumps({"query": name, "mult": mult, "sec": dt}),
                  flush=True)
            # bench-grade housekeeping: the iterative probes pin
            # checkpointed RDD blocks; release them synchronously so
            # later probes aren't timed under earlier probes' storage
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(True)
            spark.sparkContext._jvm.System.gc()

    base = mults[0]
    summary = {
        name: {
            f"x{m}": round(times[m] / times[base], 2)
            for m in mults
        }
        for name, times in results.items()
    }
    print(json.dumps({"scaling_vs_x1": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
