"""The driver runs ``python bench.py`` per round and parses ONE JSON
line — round 2 shipped a bench that exited rc=1 and the whole round's
performance signal was lost.  This smoke runs the real harness end to
end (subset via SPARK_GRAFT_BENCH_ONLY) and pins the output contract."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_one_valid_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_ONLY="wordcount,inverted_index",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert set(out) == {"metric", "value", "unit", "queries", "sf"}
    assert out["unit"] == "sec" and out["sf"] == 0.001
    assert set(out["queries"]) == {"wordcount", "inverted_index"}
    assert out["value"] > 0
