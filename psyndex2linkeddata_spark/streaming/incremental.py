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


def stream_corpus_chunks(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    mix_rates: dict[str, float] | None = None,
    min_tokens: int = 5,
    max_dup_word_frac: float = 0.9,
    cdc_divisor: int = 64,
) -> None:
    """Incremental training-corpus prep: new document files → scrubbed,
    quality-gated, CDC-chunked parquet, exactly once per doc.

    Only the NARROW prep stages run per micro-batch (mix sampling, PII
    scrub, per-row gates, chunking — all stateless per document, so a
    batch is just a filtered projection). Near-dup dedup and benchmark
    decontamination are deliberately NOT in the stream: both need
    corpus-global state (the LSH pair graph / the full gram set) that a
    micro-batch can't see; they run as the periodic batch compaction
    over the accumulated chunk table (plans/corpus.py), which is how a
    production crawl pipeline splits it too — stream the cheap hygiene,
    compact the global passes.

    Same idempotency contract as stream_triples: per-batch overwrite
    into batch_id=<id> directories, so at-least-once foreachBatch
    becomes effective exactly-once.
    """
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from psyndex2linkeddata_spark.plans.corpus import prepare_training_corpus

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ])
    docs = spark.readStream.schema(schema).format("parquet").load(docs_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        chunks = prepare_training_corpus(
            batch_df,
            mix_rates=mix_rates,
            min_tokens=min_tokens,
            max_dup_word_frac=max_dup_word_frac,
            max_top_bigram_frac=None,
            benchmark=None,
            dedup=False,
            chunking="cdc",
            cdc_divisor=cdc_divisor,
        )
        chunks.write.mode("overwrite").parquet(
            os.path.join(out_dir, "chunks", f"batch_id={int(batch_id)}")
        )

    q = (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "stream"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
