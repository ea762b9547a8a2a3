#!/usr/bin/env python3
"""Runtime-plan audit (VERDICT r8 item 6): EXECUTE the heavy family
and capture the FINAL adaptive plans.

PLANS.md audits static explain output; AQE's runtime conversions
(sort-merge -> broadcast once real stats arrive, partition coalescing,
skew splits) and the session's runtime bloom-filter pushdown were
previously asserted only indirectly.  This tool runs each heavy query
to completion, then reads ``queryExecution().executedPlan()`` — for an
adaptive plan that string carries ``isFinalPlan=true`` plus the
re-planned tree — and reports, per query:

  * smj_static / smj_final      — SortMergeJoins before/after AQE
  * bhj_final                   — broadcast hash joins in the final plan
  * aqe_reads / aqe_coalesced / aqe_skewed
                                — AQEShuffleRead nodes and how many are
                                  coalesced / skew-split
  * bloom_runtime               — a runtime bloom filter reached a scan

Interpretation contract (gated in tests/test_plan_quality.py):
every STATIC SortMergeJoin must either convert to broadcast at runtime
or survive as a genuinely large-large join; at fixture scale (both
sides small) that means smj_final == 0 for the non-iterative family —
a final-plan SMJ at sf0.01 would mean AQE cannot see the small size,
i.e. a stats bug worth failing on.  Measured exception:
hybrid_rrf_retrieval's surviving SMJ is the FULL-OUTER merge of its
two rank lists — each side is a TakeOrdered top-k (<= 50 rows by
construction, corpus-size-independent), and broadcast conversion does
not apply to that full-outer shape; a bounded-input SMJ is fine at
any scale.  Iterative queries execute their loops at plan-BUILD time
(localCheckpoint pins), so their final plan audits the last stage
over ExistingRDD scans; their per-iteration plans are gated in
test_clustering/test_lsh_recall.

``--mechanisms`` (VERDICT r9 item 1) additionally runs the two
synthetic probe shapes in plans/runtime_witness.py — the bloom
fact⋈filtered-dim join and the planted-hot-key skew join — and
reports the runtime artifacts the registered family never produces at
fixture scale: the `might_contain` filter's rows-pruned metric and
`AQEShuffleRead`'s numSkewedPartitions/numSkewedSplits.

Usage: python tools/runtime_plan_report.py [sf_dir] [--queries a,b,c]
       [--mechanisms]
Prints one JSON line per query plus an appendix block to paste into
PLANS.md (also written to .scratch/runtime_plans.md).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grpc_map_reduce_spark import get_spark, registry

#: The heavy family: driver warm-median top-5 (VERDICT r8) plus the
#: LSH/retrieval chains whose static audit shows SMJs or wide joins.
HEAVY = [
    "dedup_rule_attribution",
    "dedup_canonical",
    "docs_leakage_safe_split",
    "pagerank_neardup",
    "dedup_communities_lpa",
    "dedup_clusters",
    "docs_split_contamination",
    "dedup_lsh_neardup_guarded",
    "semdedup",
    "hybrid_rrf_retrieval",
]


def final_plan_audit(df) -> dict:
    """Execute ``df`` and audit the FINAL (post-AQE) physical plan."""
    df.collect()  # heavy-family outputs are reduced tables — bounded
    qe = df._jdf.queryExecution()
    final = qe.executedPlan().toString()
    static = qe.sparkPlan().toString()
    # AdaptiveSparkPlan.toString() prints BOTH trees — "== Final Plan
    # ==" then "== Initial Plan ==".  Counting the whole string
    # double-counts and reports pre-AQE SMJs as survivors (found the
    # hard way: every 'survivor' in the first run of this tool was in
    # the Initial section, the Final tree had converted to broadcast).
    final = final.split("== Initial Plan ==", 1)[0]
    # A plan with no exchanges/subqueries never gets an
    # AdaptiveSparkPlan wrapper — that's a plan too simple for AQE,
    # not an AQE failure.
    adaptive = "AdaptiveSparkPlan" in final
    return {
        "is_final": ("isFinalPlan=true" in final) or not adaptive,
        "adaptive": adaptive,
        "smj_static": static.count("SortMergeJoin"),
        "smj_final": final.count("SortMergeJoin"),
        "bhj_final": final.count("BroadcastHashJoin"),
        "aqe_reads": final.count("AQEShuffleRead"),
        "aqe_coalesced": len(re.findall(r"AQEShuffleRead coalesced", final)),
        "aqe_skewed": len(re.findall(r"skewed=true|AQEShuffleRead skewed",
                                     final)),
        "bloom_runtime": ("bloomfilter" in final.lower()
                          or "might_contain" in final),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--queries", default=None,
                    help="comma-separated override of the heavy list")
    ap.add_argument("--mechanisms", action="store_true",
                    help="also run the synthetic bloom/skew witnesses "
                         "at probe volume")
    args = ap.parse_args()
    names = args.queries.split(",") if args.queries else HEAVY

    spark = get_spark("runtime-plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    rows = []
    for name in names:
        df = qs[name].spark_fn(spark, args.sf_dir)
        rec = {"query": name, **final_plan_audit(df)}
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    lines = [
        "| query | smj static→final | bhj final | AQE reads (coalesced/skewed) | runtime bloom |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['query']} | {r['smj_static']}→{r['smj_final']} "
            f"| {r['bhj_final']} | {r['aqe_reads']} "
            f"({r['aqe_coalesced']}/{r['aqe_skewed']}) "
            f"| {'yes' if r['bloom_runtime'] else '—'} |"
        )
    appendix = "\n".join(lines)

    if args.mechanisms:
        from grpc_map_reduce_spark.plans.runtime_witness import (
            bloom_pruning_witness, skew_split_witness)

        bw = bloom_pruning_witness(spark)
        print(json.dumps({"bloom_witness": bw}), flush=True)
        sw = skew_split_witness(spark)
        print(json.dumps({"skew_witness": sw}), flush=True)
        mech = [
            "",
            "### Synthetic mechanism witnesses (probe volume, "
            "thresholds lowered — defaults cross at 100 TB)",
            "",
            "| mechanism | fired | runtime evidence |",
            "|---|---|---|",
            f"| runtime bloom filter | "
            f"{'yes' if bw['bloom_filter_nodes'] else 'NO'} | "
            f"{bw['rows_pruned']:,} of {bw['fact_rows_scanned']:,} fact "
            f"rows pruned before the shuffle "
            f"({bw['rows_after_bloom']:,} survive might_contain, "
            f"{bw['rows_joined']:,} join); wall on/off "
            f"{bw['wall_bloom_on_s']}/{bw['wall_bloom_off_s']} s |",
            f"| AQE skew-join split | "
            f"{'yes' if sw['num_skewed_splits'] else 'NO'} | "
            f"{sw['num_skewed_partitions']} skewed partition(s) split "
            f"into {sw['num_skewed_splits']} reads "
            f"(AQEShuffleRead metrics, final plan); wall {sw['wall_s']} s |",
        ]
        appendix += "\n" + "\n".join(mech)
        if not bw["bloom_filter_nodes"] or not sw["num_skewed_splits"]:
            print(json.dumps({"mechanism_witness_failed": True}))
            return 1

    print(appendix)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".scratch", "runtime_plans.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        fh.write(appendix + "\n")
    bad = [r["query"] for r in rows if not r["is_final"]]
    # fixture-scale contract: no SMJ should survive AQE (both sides
    # are small here — a survivor means AQE never saw real stats)
    survivors = [r["query"] for r in rows if r["smj_final"] > 0]
    print(json.dumps({"non_adaptive": bad, "smj_survivors": survivors}))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
