"""The driver runs ``python bench.py`` per round and parses ONE JSON
line — round 2 shipped a bench that exited rc=1 and the whole round's
performance signal was lost.  This smoke runs the real harness end to
end (subset via SPARK_GRAFT_BENCH_ONLY) and pins the output contract."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_one_valid_json_line_with_warm_medians():
    """Contract + methodology gate: the harness MUST warm up each
    query once and report the median of N timed repeats — a single
    cold measurement manufactured phantom 2–6x regressions in two
    consecutive rounds (VERDICT r4)."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_ONLY="wordcount,inverted_index",
        SPARK_GRAFT_BENCH_REPEATS="2",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert set(out) == {
        "metric", "value", "unit", "queries", "queries_cold", "repeats", "sf"
    }
    assert out["unit"] == "sec" and out["sf"] == 0.001
    assert set(out["queries"]) == {"wordcount", "inverted_index"}
    # warm-up + median discipline: every query has BOTH a cold number
    # and a warm median, and the total is the sum of warm medians
    assert set(out["queries_cold"]) == set(out["queries"])
    assert out["repeats"] == 2
    assert out["value"] == round(sum(out["queries"].values()), 3) > 0
    for name, warm in out["queries"].items():
        assert warm > 0 and out["queries_cold"][name] > 0
