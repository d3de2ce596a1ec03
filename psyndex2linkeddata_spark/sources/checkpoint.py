"""Checkpoint / lineage / metrics + resumable batch runs (north_rule:
"every stage writes per-partition lineage and metrics to a checkpoint
table so a killed run resumes exactly where it stopped").

The reference approximates resumability with redis request-caching and
RECORDS_START/END slice windows (/root/reference/convert_starxml_to_bf.py
:44-46,64-85,1506). Here:

- input is bucketed by a stable hash of `url` (crc32 % n_buckets) — the
  same bucketing a real deployment would get from Iceberg's bucket(url)
  partition transform;
- work proceeds in bucket batches; each committed batch appends one
  lineage row per bucket to the checkpoint table: (stage, run_id, bucket,
  row_count, n_triples, wall_s, status, ts);
- resume = anti-join pending buckets against committed ones — a killed
  run redoes only its uncommitted batch.

S9/S10 (log sink, run manifest) map to the same table: `run_manifest`
rows carry generationProcess/generationDate like the reference's
AdminMetadata bnode (convert_starxml_to_bf.py:1518-1549).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

CKPT_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("n_triples", T.LongType(), False),
        T.StructField("wall_s", T.DoubleType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def bucket_col(n_buckets: int):
    return F.pmod(F.crc32(F.col("url")), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, ckpt_dir: str, stage: str) -> set[int]:
    path = os.path.join(ckpt_dir, "lineage")
    try:
        df = spark.read.parquet(path)
    except Exception:
        return set()
    return {
        r.bucket
        for r in df.where(
            (F.col("stage") == stage) & (F.col("status") == "done")
        ).select("bucket").distinct().collect()
    }


def _append_lineage(spark, ckpt_dir: str, rows: list[dict]) -> None:
    # coalesce(1): the whole batch's lineage lands as ONE file (written
    # via temp + rename) — a crash can lose the entire commit but never
    # persist half of it, so resume sees a batch as all-done or all-pending
    spark.createDataFrame(rows, schema=CKPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(ckpt_dir, "lineage"))


def run_checkpointed(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    ckpt_dir: str,
    process,
    stage: str = "triples",
    n_buckets: int = 16,
    buckets_per_commit: int = 4,
    run_id: str | None = None,
) -> dict:
    """Resumable pages→triples run. `process` is pages-DF → triples-DF.

    Each bucket's output lands under out_dir/bucket=<b>/ — a
    DETERMINISTIC location written with overwrite, so re-running a bucket
    after a crash replaces its rows instead of duplicating them (and
    re-reads prune on the bucket= partition). A batch's lineage rows
    commit only after every bucket of the batch is written, as one atomic
    single-file append — kill the process anywhere and the next
    invocation redoes exactly the buckets whose lineage never landed.
    """
    import datetime as dt

    run_id = run_id or uuid.uuid4().hex[:12]
    done = completed_buckets(spark, ckpt_dir, stage)
    pending = [b for b in range(n_buckets) if b not in done]
    bucketed = pages.withColumn("_bucket", bucket_col(n_buckets))
    batches_run = 0
    for i in range(0, len(pending), buckets_per_commit):
        batch = pending[i : i + buckets_per_commit]
        rows = []
        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        for b in batch:
            t0 = time.time()  # per-bucket wall time, not cumulative batch
            part = bucketed.where(F.col("_bucket") == b)
            n_pages = part.count()
            triples = process(part.drop("_bucket"))
            out_path = os.path.join(out_dir, f"bucket={b:05d}")
            triples.write.mode("overwrite").parquet(out_path)
            n_triples = spark.read.parquet(out_path).count()
            rows.append(
                dict(
                    stage=stage,
                    run_id=run_id,
                    bucket=b,
                    row_count=int(n_pages),
                    n_triples=int(n_triples),
                    wall_s=float(time.time() - t0),
                    status="done",
                    ts=now,
                )
            )
        # lineage commits AFTER the whole batch's output writes — the
        # crash-recovery line
        _append_lineage(spark, ckpt_dir, rows)
        batches_run += 1
    return {
        "run_id": run_id,
        "resumed_buckets": len(done),
        "processed_buckets": len(pending),
        "batches": batches_run,
    }


def run_manifest(spark: SparkSession, ckpt_dir: str, run_id: str, **attrs) -> None:
    """S10: one manifest row per run (generationProcess/Date analog of the
    reference's AdminMetadata bnode)."""
    import datetime as dt

    row = {
        "run_id": run_id,
        "generation_process": "psyndex2linkeddata_spark",
        "generation_date": dt.datetime.now(dt.timezone.utc).replace(tzinfo=None),
        **{k: str(v) for k, v in attrs.items()},
    }
    spark.createDataFrame([row]).write.mode("append").parquet(
        os.path.join(ckpt_dir, "run_manifest")
    )
