"""Structured Streaming jobs.

The reference has NO streaming surface (SURVEY.md §2A tail note) — this
module exists for the graft's continuous-ingest shape: a pages/events
stream -> watermarked event-time windows -> per-window cell/tile
aggregates, the streaming twin of the batch G6 aggregation.

Patterns used: readStream over a file source with a fixed schema,
withWatermark for bounded state, window() aggregation in append mode
(only closed windows emit — deterministic, replayable), and
foreachBatch for sinks that need batch-only features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def stream_events(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """File-source event stream (one parquet dir; availableNow triggers in
    tests drain it deterministically)."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(events: DataFrame, window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Event-time windowed counts + value sums per event_type with a
    watermark bounding state — the streaming analog of the batch G6 tile
    aggregation.  Append output mode => only finalized windows emit."""
    return (events
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
            .agg(F.count("*").alias("n_events"),
                 F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).alias("total_cents"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "total_cents"))


def run_available_now(stream_df: DataFrame, query_name: str, checkpoint: str):
    """Drain everything currently available and stop — the deterministic
    test/batch-replay mode; production runs the same query continuously."""
    q = (stream_df.writeStream
         .format("memory")
         .queryName(query_name)
         .outputMode("append")
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
