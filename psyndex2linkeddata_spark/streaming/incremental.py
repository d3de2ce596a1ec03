"""Incremental KG construction with Structured Streaming.

`stream_triples` runs the full pages→triples pipeline over an append-only
parquet directory with Trigger.AvailableNow: each invocation processes
exactly the files not yet seen (file-source checkpoint), appends triples
partitioned parquet, and records per-batch metrics — re-running after new
pages arrive (or after a crash) picks up precisely where it stopped.

foreachBatch is the right shape here: the emit stage is stateless per
page (one record per page → triple dedup is record-local except for
shared vocabulary nodes, which are idempotent re-emits). foreachBatch
itself is at-least-once, so the sink is made IDEMPOTENT per batch_id:
output lands in batch_id=<id> directories written with overwrite — a
crash/retry between the parquet write and the streaming checkpoint
commit re-runs the batch into the same directory instead of appending
duplicates. at-least-once + idempotent writes = effective exactly-once.

`sessionize_events_stream` shows the stateful side: event-time session
windows with a watermark (late data tolerated up to the watermark bound).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from psyndex2linkeddata_spark.plans.pipeline import build_triples
from psyndex2linkeddata_spark.schema import pages_schema


def stream_triples(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Process all not-yet-seen page files, then stop (AvailableNow)."""
    reader = (
        spark.readStream.schema(pages_schema())
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.load(pages_dir)

    metrics_path = os.path.join(checkpoint_dir, "batch_metrics")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        triples = build_triples(batch_df)
        # idempotent per batch_id: a retried batch overwrites its own
        # directory rather than appending a duplicate copy
        triples.write.mode("overwrite").parquet(
            os.path.join(out_dir, "triples", f"batch_id={int(batch_id)}")
        )
        n_pages = batch_df.count()
        spark_ = batch_df.sparkSession
        # the batch_id=<id> partition directory encodes the id; keeping it
        # out of the data schema avoids the COLUMN_ALREADY_EXISTS conflict
        # on read (partition discovery restores the column)
        spark_.createDataFrame(
            [(int(n_pages),)], "n_pages long"
        ).withColumn("ts", F.current_timestamp()).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(metrics_path, f"batch_id={int(batch_id)}"))

    q = (
        pages.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "stream"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def sessionize_events_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Event-time session windows with watermarking (streaming DF in,
    streaming DF out): count events per (user, session window); late
    events beyond 10 minutes are dropped by the watermark."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts"), f"{gap_minutes} minutes"),
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
    )
