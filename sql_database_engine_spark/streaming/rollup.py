"""Hypertable-style continuous aggregate: a time-bucketed rollup table
maintained incrementally from the event stream.

The batch view is ``events_tumbling_window`` (operators/events.py);
this module keeps a *materialized* copy current as data arrives:
every micro-batch is aggregated to (hour bucket, event_type) partials
and merged into the rollup store via foreachBatch — the
TimescaleDB-continuous-aggregate / materialized-rollup pattern on
Spark primitives.

Merge mechanics (each one load-bearing):
- the store is parquet partitioned by bucket date; a refresh rewrites
  only the date partitions the batch touched (dynamic partition
  overwrite) — cost proportional to arriving data, not to history.
- read-merge-overwrite of the SAME path is illegal in one Spark job
  (the writer would delete partitions the plan is still reading), so
  the merged rows are staged to a scratch directory first, then
  re-read and committed to the store.
- foreachBatch delivers at-least-once: idempotency is carried IN the
  data — every committed row stores the epoch that wrote it, and a
  replayed batch skips any partition whose max(last_epoch) already
  reached it, so the epoch check commits atomically with the rows
  (a marker file is kept only as a fast path; a crash between commit
  and marker is handled by the in-data check). Store and checkpoint
  lifecycles are coupled: epoch ids restart with a fresh checkpoint,
  so a new checkpoint requires a new (or truncated) store.
- a missing store means "first refresh"; any OTHER read error must
  fail the batch (the checkpoint will retry) — swallowing it would
  silently replace accumulated history with one batch's partials.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.exact import cents
from .events_stream import events_stream


def _epoch_marker(store_path: str, epoch_id: int) -> str:
    return os.path.join(store_path, "_applied_epochs", str(epoch_id))


def _store_has_data(store_path: str) -> bool:
    if not os.path.isdir(store_path):
        return False
    for root, _dirs, files in os.walk(store_path):
        if "_applied_epochs" in root:
            continue
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def _merge_partials(store_path: str):
    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        if os.path.exists(_epoch_marker(store_path, epoch_id)):
            return  # replayed batch (at-least-once delivery): no-op
        partials = (
            batch_df
            .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(cents(F.col("value"))).alias("value_cents"))
            .withColumn("bucket_date", F.to_date("window_start"))
            .withColumn("last_epoch", F.lit(epoch_id))
            .persist()  # tiny post-aggregation frame, read twice below
        )
        try:
            if _store_has_data(store_path):
                existing = spark.read.parquet(store_path)
                touched = [r.bucket_date for r in
                           partials.select("bucket_date").distinct().collect()]
                ex_touched = existing.filter(F.col("bucket_date").isin(touched))
                # In-data idempotency: a partition whose max(last_epoch)
                # already reached this epoch absorbed this batch in a
                # prior attempt that crashed after the commit but before
                # the marker — merging it again would double-count.
                done = {r.bucket_date for r in
                        (ex_touched.groupBy("bucket_date")
                         .agg(F.max("last_epoch").alias("me"))
                         .filter(F.col("me") >= epoch_id).collect())}
                todo = [d for d in touched if d not in done]
                if not todo:
                    os.makedirs(os.path.dirname(
                        _epoch_marker(store_path, epoch_id)), exist_ok=True)
                    open(_epoch_marker(store_path, epoch_id), "w").close()
                    return
                merged = (
                    ex_touched.filter(F.col("bucket_date").isin(todo))
                    .unionByName(partials.filter(F.col("bucket_date").isin(todo)))
                    .groupBy("window_start", "event_type", "bucket_date")
                    .agg(F.sum("n").alias("n"),
                         F.sum("value_cents").alias("value_cents"),
                         F.max("last_epoch").alias("last_epoch"))
                )
                # Stage: the merged plan reads store_path, so it cannot
                # overwrite store_path in the same job.
                scratch = os.path.join(store_path, "_scratch_epoch", str(epoch_id))
                merged.write.mode("overwrite").parquet(scratch)
                commit_df = spark.read.parquet(scratch)
            else:
                scratch = None
                commit_df = partials
            (commit_df.write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("bucket_date")
             .parquet(store_path))
            if scratch:
                shutil.rmtree(scratch, ignore_errors=True)
            os.makedirs(os.path.dirname(_epoch_marker(store_path, epoch_id)),
                        exist_ok=True)
            open(_epoch_marker(store_path, epoch_id), "w").close()
        finally:
            partials.unpersist()
    return merge


def continuous_rollup(spark: SparkSession, sf_dir: str, store_path: str,
                      checkpoint: str):
    """Start (availableNow) the incremental rollup refresh; returns the
    StreamingQuery. Call .awaitTermination() to drain the backlog."""
    ev = events_stream(spark, sf_dir)
    return (ev.writeStream
            .foreachBatch(_merge_partials(store_path))
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def read_rollup(spark: SparkSession, store_path: str) -> DataFrame:
    """The rollup as a queryable table (dollars view over exact cents)."""
    return (spark.read.parquet(store_path)
            .select("window_start", "event_type", "n",
                    (F.col("value_cents").cast("double") / 100.0).alias("total_value")))
