"""Structured Streaming jobs — the reference's long-running xactions.

The reference has no event-time streams (SURVEY.md §2.12); its
streaming-shaped things are demand-driven long-running jobs: download
ingest (S10), bucket sync (F5/M10), prefetch warming (M2). Here each is
an incremental Structured Streaming query:

- file-source streams over catalog directories pick up new catalog
  slices as they land (``maxFilesPerTrigger`` = the reference's
  per-job rate limits);
- ``Trigger.AvailableNow`` gives the reference's "run to drain, then
  idle" xaction lifecycle (``xact/api_table.go:80-82 Idles``);
- ``foreachBatch`` applies the batch-mode operators (anti-joins,
  transforms) exactly-once per micro-batch — the single-source-of-
  truth semantics stay in the batch operators.

The events table additionally gets a real event-time pipeline
(watermark + windowed aggregation) as the beyond-reference streaming
surface for pipeline telemetry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # int64 unix-nanos (see session.py)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str, files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over the events table (nanos → timestamp)."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        # file stream sources take a directory; select just the events
        # table out of the testdata dir
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn(
        "event_time", F.timestamp_micros((F.col("ts") / 1000).cast("bigint"))
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time windowed rollup with late-data watermark: the
    telemetry stream a 100 TB ingest pipeline runs alongside the data
    path (per-type rates, the A3 job-stats rollup as a stream)."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
    )


def incremental_sync(
    catalog_stream: DataFrame,
    remote: DataFrame,
    checkpoint: str,
    out_table: str = "sync_out",
):
    """M10/F5 as an incremental job: per micro-batch of local-catalog
    changes, anti-join against the remote listing and emit the prune
    plan. ``foreachBatch`` reuses the batch operator — streaming is
    orchestration, not separate semantics."""
    from aistore_spark.operators.movement import sync_prune_plan

    def run_batch(df: DataFrame, epoch_id: int) -> None:
        sync_prune_plan(df, remote).write.format("noop").mode("append").save()

    return (
        catalog_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(run_batch)
        .trigger(availableNow=True)
    )
