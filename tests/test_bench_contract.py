"""The driver runs ``python bench.py`` per round and parses ONE JSON
line — round 2 shipped a bench that exited rc=1 and the whole round's
performance signal was lost.  This smoke runs the real harness end to
end (subset via SPARK_GRAFT_BENCH_ONLY) and pins the output contract."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest


def test_bench_emits_one_valid_json_line_with_warm_mins():
    """Contract + methodology gate: the harness MUST warm up each
    query once and report the min over N passes of timed repeats — a
    single cold measurement manufactured phantom 2–6x regressions in
    two consecutive rounds (VERDICT r4), and per-query medians of
    consecutive runs were still load-correlated enough to flag 10
    phantom regressions in one round (VERDICT r10)."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_ONLY="wordcount,inverted_index",
        SPARK_GRAFT_BENCH_REPEATS="2",
        SPARK_GRAFT_BENCH_PASSES="2",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = proc.stdout.strip().splitlines()
    # Truncation contract (round 7): the LAST line is the compact
    # summary that must survive the driver's 2 KB stdout tail; the
    # full record is the line before it.
    tail = json.loads(lines[-1])
    assert set(tail) == {
        "metric", "value", "unit", "sf", "n_queries", "repeats",
        "passes", "pass_totals", "spread_pct", "loadavg",
        "cold_over_warm", "queries", "slowest", "regressed",
    }
    assert tail["n_queries"] == 2 and tail["sf"] == 0.001
    # VERDICT r11 item 1: the FINAL line (the only one the driver's
    # ~8 KB stdout tail reliably parses) must itself carry the full
    # warm per-query map — rounds 10/11 printed it only on line 1 and
    # PERF lost every per-query/geomean/scaling signal.
    assert set(tail["queries"]) == {"wordcount", "inverted_index"}
    out = json.loads(lines[-2])
    assert set(out) == {
        "metric", "value", "unit", "queries", "queries_cold",
        "cold_minus_warm", "cold_over_warm", "repeats", "passes",
        "pass_totals", "spread_pct", "loadavg", "sf",
    }
    assert tail["value"] == out["value"]
    assert set(tail["slowest"]) <= set(out["queries"])
    assert out["unit"] == "sec" and out["sf"] == 0.001
    assert set(out["queries"]) == {"wordcount", "inverted_index"}
    # warm-up + min-over-passes discipline: every query has BOTH a
    # cold number and a warm min, the total is the sum of warm mins,
    # and the noise-evidence fields are self-consistent.
    assert set(out["queries_cold"]) == set(out["queries"])
    assert set(out["cold_minus_warm"]) == set(out["queries"])
    assert out["repeats"] == 2 and out["passes"] == 2
    assert len(out["pass_totals"]) == 2
    assert out["spread_pct"] >= 0
    assert len(out["loadavg"]) == 2
    assert out["value"] == round(sum(out["queries"].values()), 3) > 0
    # the reported min can never exceed either pass's own min-sum
    assert out["value"] <= min(out["pass_totals"]) + 1e-6
    for name, warm in out["queries"].items():
        assert warm > 0 and out["queries_cold"][name] > 0
        assert out["cold_minus_warm"][name] == round(
            out["queries_cold"][name] - warm, 3
        )
    assert out["cold_over_warm"] == round(
        sum(out["queries_cold"].values()) / out["value"], 3
    )


@pytest.mark.slow
def test_inventory_cold_total_within_budget():
    """VERDICT r5 item 5: nothing gated the cold signal — a per-query
    cold-cost regression (codegen explosion, plan-compile blowup)
    could hide behind the warm medians.  Run the FULL inventory once
    (repeats=1, sf0.001) and gate cold total < 1.5x warm total.

    Slow tier (round 12): a full 175-query inventory run is minutes of
    wall — part of what overran the driver's verify window."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_REPEATS="1",
        # one pass: this gate compares cold vs warm, not pass-to-pass
        # noise, and min-of-passes warm numbers would tighten the
        # denominator for free (the 1.5x budget is calibrated to a
        # single warm run per query).
        SPARK_GRAFT_BENCH_PASSES="1",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = proc.stdout.strip().splitlines()
    tail = json.loads(lines[-1])
    # Full inventory: the final line must stay under the driver's
    # ~8 KB truncation window WITH the full per-query map aboard
    # (round-12 contract) and carry the top-10 warm mins.
    assert len(lines[-1]) < 8000, (
        f"final bench line is {len(lines[-1])} B; the driver keeps "
        "only the last ~8 KB of stdout"
    )
    assert len(tail["slowest"]) == 10
    out = json.loads(lines[-2])
    assert set(tail["queries"]) == set(out["queries"])
    assert tail["queries"] == out["queries"]
    cold_total = sum(out["queries_cold"].values())
    assert out["cold_over_warm"] == round(cold_total / out["value"], 3)
    assert out["cold_over_warm"] < 1.5, (
        "inventory cold total exceeds 1.5x warm total; worst offenders: "
        + str(sorted(out["cold_minus_warm"].items(),
                     key=lambda kv: -kv[1])[:5])
    )
