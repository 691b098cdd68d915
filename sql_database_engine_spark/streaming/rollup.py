"""Hypertable-style continuous aggregate: a time-bucketed rollup table
maintained incrementally from the event stream.

The batch view is ``events_tumbling_window`` (operators/events.py);
this module keeps a *materialized* copy current as data arrives:
every micro-batch is aggregated to (hour bucket, event_type) partials
and merged into the rollup store via foreachBatch — the
TimescaleDB-continuous-aggregate / materialized-rollup pattern on
Spark primitives.

Merge strategy: the store is parquet partitioned by bucket date; each
micro-batch overwrites only the date partitions it touches (dynamic
partition overwrite) after merging new partials with the existing
rows — append-mostly, bounded rewrite, no global recompute. At
100 TB the bucket-date partitioning keeps each refresh proportional
to the data that actually arrived, not to history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .events_stream import events_stream


def _merge_partials(store_path: str):
    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        partials = (
            batch_df
            .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"))
            .withColumn("bucket_date", F.to_date("window_start"))
        )
        try:
            existing = spark.read.parquet(store_path)
        except Exception:
            existing = None
        if existing is not None:
            touched = [r.bucket_date for r in
                       partials.select("bucket_date").distinct().collect()]
            merged = (
                existing.filter(F.col("bucket_date").isin(touched))
                .unionByName(partials)
                .groupBy("window_start", "event_type", "bucket_date")
                .agg(F.sum("n").alias("n"), F.sum("value_cents").alias("value_cents"))
            )
        else:
            merged = partials
        (merged.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("bucket_date")
         .parquet(store_path))
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
