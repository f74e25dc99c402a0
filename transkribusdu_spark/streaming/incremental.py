"""Incremental / streaming processing.

The reference is strictly batch (SURVEY.md §2.11); the north rule's
resumability maps to batch-with-lineage (pipeline/lineage.py). This
module adds the Structured Streaming capabilities a continuously-fed
Common-Crawl ingest would use:

- ``stream_extract``: readStream over a pages directory ->
  the same parse+extract pipeline -> parquet sink with checkpointing,
  ``Trigger.AvailableNow`` (process-everything-then-stop = resumable
  incremental batch; kill it and the checkpoint resumes exactly).
- ``windowed_event_counts``: event-time windowed aggregation with a
  watermark for late data (the events table plays the role of a
  crawler telemetry stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.extract import extract_text_spans
from ..pipeline.parse import parse_pages
from ..schemas import PAGES_SCHEMA


def stream_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Incremental extraction over a growing pages directory.

    Returns the started StreamingQuery (AvailableNow: drains what exists,
    checkpoints, stops — rerunning after new files land processes only
    the delta)."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(pages_dir)

    # Streaming cannot use unbounded windows; extraction per micro-batch
    # is complete because files are whole documents (foreachBatch runs
    # the full batch pipeline — parse + extract — on each increment).
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        extract_text_spans(parse_pages(batch_df)).write.mode("append").parquet(out_dir)

    q = (
        pages.writeStream.foreachBatch(
            lambda df, bid: sink(df, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return q


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Event-time windowed counts per event_type (works identically on a
    batch DataFrame and a stream with the watermark bounding state)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )
