"""Fault-injection gate for the reliable-checkpoint knob (VERDICT r6
item 3): plans/checkpoint.py is the cluster-correctness story, but
until this test nothing exercised RECOVERY — it runs an iterative
query (connected components) in reliable mode with an injected
once-per-attempt task failure and asserts the job completes with the
exact expected result.

Local mode ignores ``spark.task.maxFailures`` (the retry count comes
from the master string), so the scenario needs its own
``local[4,3]`` session — hence a subprocess, same pattern as
test_bench_contract.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

_SCRIPT = r"""
import glob, json, os, sys
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession

ckpt_dir = sys.argv[2]
flag = sys.argv[3]

# local[4,3]: 4 threads, tasks retry up to 3 attempts — the only way
# local mode honors task retry at all.
spark = (
    SparkSession.builder.master("local[4,3]")
    .appName("ckpt-recovery")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.graft.reliableCheckpointDir", ckpt_dir)

from grpc_map_reduce_spark.operators.clustering import connected_components

# Two chains: 0-1-...-29 and 1000-1001-...-1029 -> components 0, 1000.
rows = [(i, i + 1) for i in range(29)] + [
    (1000 + i, 1001 + i) for i in range(29)
]
edges = spark.createDataFrame(rows, "src long, dst long").repartition(4)


def faulty(batches):
    # Throw exactly once across the job (file-based task-local flag):
    # the first task attempt to arrive records the flag and dies; its
    # retry — and every other task — passes through.
    if not os.path.exists(flag):
        open(flag, "w").close()
        raise RuntimeError("injected task failure (checkpoint recovery test)")
    for pdf in batches:
        yield pdf


edges = edges.mapInPandas(faulty, schema="src long, dst long")

cc = {(r.node, r.component) for r in connected_components(edges).collect()}
expected = {(i, 0) for i in range(30)} | {
    (1000 + i, 1000) for i in range(30)
}
result = {
    "fault_fired": os.path.exists(flag),
    "correct": cc == expected,
    "n_nodes": len(cc),
    # reliable mode must actually have written checkpoint data
    "ckpt_files": len(glob.glob(os.path.join(ckpt_dir, "*", "rdd-*"))),
}
print("RESULT:" + json.dumps(result))
spark.stop()
"""


def test_reliable_checkpoint_survives_injected_task_failure():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        ckpt = os.path.join(tmp, "ckpt")
        flag = os.path.join(tmp, "fault-fired")
        script = os.path.join(tmp, "scenario.py")
        with open(script, "w") as fh:
            fh.write(_SCRIPT)
        proc = subprocess.run(
            [sys.executable, script, repo, ckpt, flag],
            capture_output=True, text=True, timeout=600,
            env=dict(os.environ),
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
        assert line, proc.stdout[-2000:]
        out = json.loads(line[-1][len("RESULT:"):])
        assert out["fault_fired"], "injection never fired — test is vacuous"
        assert out["correct"], f"wrong components after recovery: {out}"
        assert out["n_nodes"] == 60
        assert out["ckpt_files"] > 0, "reliable mode wrote no checkpoint data"
