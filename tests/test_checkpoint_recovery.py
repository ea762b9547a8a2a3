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

import pytest

# Slow tier (round 12, VERDICT r11 item 5): each recovery gate boots
# its own local[4,3] session in a fresh subprocess (~25 s each) —
# fault-injection probe tier, opt-in via SPARK_GRAFT_SLOW_TESTS=1.
pytestmark = pytest.mark.slow

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


_PAGERANK_SCRIPT = r"""
import json, os, sys
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession

ckpt_dir = sys.argv[2]
flag = sys.argv[3]

spark = (
    SparkSession.builder.master("local[4,3]")
    .appName("ckpt-recovery-pagerank")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from grpc_map_reduce_spark.operators import clustering
from grpc_map_reduce_spark.plans.checkpoint import iter_checkpoint as _orig

# Ring of 40 nodes plus chords — non-uniform degrees so ranks differ.
rows = [(i, (i + 1) % 40) for i in range(40)] + [
    (i, (i + 7) % 40) for i in range(0, 40, 3)
]
edges = spark.createDataFrame(rows, "src long, dst long").repartition(4)

# Ground truth: plain run, no reliable mode, no injection.
want = sorted(map(tuple, clustering.pagerank(edges).collect()))

spark.conf.set("spark.graft.reliableCheckpointDir", ckpt_dir)


def _faulty(schema):
    def gen(batches):
        if not os.path.exists(flag):
            open(flag, "w").close()
            raise RuntimeError("injected mid-iteration task failure")
        for pdf in batches:
            yield pdf
    return gen


CALLS = {"n": 0}
INJECT_AT = 6  # calls 1-3 are the prologue pins; 6 = ~iteration 3


def wrapped(df, eager=True):
    CALLS["n"] += 1
    if CALLS["n"] == INJECT_AT:
        df = df.mapInPandas(_faulty(df.schema), schema=df.schema)
    return _orig(df, eager)


clustering.iter_checkpoint = wrapped
got = sorted(map(tuple, clustering.pagerank(edges).collect()))

import glob
result = {
    "fault_fired": os.path.exists(flag),
    "calls": CALLS["n"],
    "correct": got == want,
    "n_nodes": len(got),
    "ckpt_files": len(glob.glob(os.path.join(ckpt_dir, "*", "rdd-*"))),
}
print("RESULT:" + json.dumps(result))
spark.stop()
"""


def test_pagerank_recovers_from_mid_iteration_failure():
    """VERDICT r7 item 5a: the CC gate injects at the INPUT scan; this
    one fails a task inside a MIDDLE power iteration's reliable
    checkpoint job (iter_checkpoint call #6) and asserts the retried
    run produces ranks identical to an uninjected plain-mode run."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        ckpt = os.path.join(tmp, "ckpt")
        flag = os.path.join(tmp, "fault-fired")
        script = os.path.join(tmp, "scenario.py")
        with open(script, "w") as fh:
            fh.write(_PAGERANK_SCRIPT)
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
        assert out["calls"] >= 6, f"pagerank made too few pins: {out}"
        assert out["correct"], f"ranks diverged after recovery: {out}"
        assert out["n_nodes"] == 40
        assert out["ckpt_files"] > 0, "reliable mode wrote no checkpoint data"


_WEDGE_SCRIPT = r"""
import json, os, sys
sys.path.insert(0, sys.argv[1])
from pyspark.sql import SparkSession
# Spark 4 split: the live class is classic.dataframe.DataFrame, which
# OVERRIDES localCheckpoint — patching the base class would miss it.
from pyspark.sql.classic import dataframe as df_mod

flag = sys.argv[2]

spark = (
    SparkSession.builder.master("local[4,3]")
    .appName("wedge-batch-recovery")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from grpc_map_reduce_spark.operators.clustering import triangle_counts

# Two K6 cliques: every node has 10 triangles in its own clique.
nodes_a, nodes_b = range(6), range(100, 106)
rows = [(a, b) for a in nodes_a for b in nodes_a if a < b] + [
    (a, b) for a in nodes_b for b in nodes_b if a < b
]
edges = spark.createDataFrame(rows, "src long, dst long").repartition(4)

want = sorted(map(tuple,
                  triangle_counts(edges, wedge_batches=4).collect()))


def _faulty(schema):
    def gen(batches):
        if not os.path.exists(flag):
            open(flag, "w").close()
            raise RuntimeError("injected wedge-batch task failure")
        for pdf in batches:
            yield pdf
    return gen


CALLS = {"n": 0}
INJECT_AT = 4  # 1 = oriented-edge pin, 2 = degree pin, 3 = batch 0,
               # 4 = batch 1 — the failure lands inside a MIDDLE
               # batch's eager partial-pin job.
_orig_lc = df_mod.DataFrame.localCheckpoint


def wrapped_lc(self, eager=True, storageLevel=None):
    CALLS["n"] += 1
    if CALLS["n"] == INJECT_AT:
        self = self.mapInPandas(_faulty(self.schema), schema=self.schema)
    return _orig_lc(self, eager=eager, storageLevel=storageLevel)


df_mod.DataFrame.localCheckpoint = wrapped_lc
got = sorted(map(tuple, triangle_counts(edges, wedge_batches=4).collect()))
df_mod.DataFrame.localCheckpoint = _orig_lc

result = {
    "fault_fired": os.path.exists(flag),
    "calls": CALLS["n"],
    "correct": got == want,
    "n_nodes": len(got),
}
print("RESULT:" + json.dumps(result))
spark.stop()
"""


def test_wedge_batch_partials_recover_from_task_failure():
    """VERDICT r7 item 5b: the eager-pin wedge design claims batch
    partials are recoverable — fail a task inside a middle batch's
    partial-pin job and assert the summed counts are exact."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        flag = os.path.join(tmp, "fault-fired")
        script = os.path.join(tmp, "scenario.py")
        with open(script, "w") as fh:
            fh.write(_WEDGE_SCRIPT)
        proc = subprocess.run(
            [sys.executable, script, repo, flag],
            capture_output=True, text=True, timeout=600,
            env=dict(os.environ),
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
        assert line, proc.stdout[-2000:]
        out = json.loads(line[-1][len("RESULT:"):])
        assert out["fault_fired"], "injection never fired — test is vacuous"
        assert out["calls"] >= 4, f"too few localCheckpoint pins: {out}"
        assert out["correct"], f"triangle counts diverged: {out}"
        assert out["n_nodes"] == 12
