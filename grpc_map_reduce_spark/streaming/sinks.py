"""Streaming sinks: exactly-once parquet ingest.

The reference's sink story is a one-shot text collection at job end
(master.go:198-229); a production ingest pipeline instead runs
CONTINUOUSLY and must survive restarts without dropping or
double-writing batches.  Structured Streaming's file sink gives
exactly-once for free: the checkpoint directory records which source
files each committed micro-batch consumed, and the sink's transaction
log records which output files each batch produced — a restarted
query resumes from the last committed batch and readers ignore
uncommitted files.

``ingest_to_parquet`` is the canonical raw-ingest hop (the "bronze"
step): stream in, optionally transform, append parquet partitions
out.  Downstream batch operators (everything in ``operators/``) read
the growing parquet directory with the normal ``spark.read`` path —
the handoff point between the streaming and batch halves of the
pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ingest_to_parquet(df: DataFrame, output_dir: str, checkpoint_dir: str,
                      partition_by: str | None = None,
                      available_now: bool = True) -> None:
    """Append-mode parquet ingest with exactly-once checkpointing.

    ``available_now=True`` drains the current backlog and stops (the
    batch-replay / test harness mode); ``False`` runs until killed
    (production).  ``partition_by`` writes hive-style directories so
    downstream readers get partition pruning (sources/layout.py).
    """
    writer = (
        df.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if partition_by is not None:
        writer = writer.partitionBy(partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
