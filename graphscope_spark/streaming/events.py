"""Structured Streaming over the events table.

The reference has no streaming surface (SURVEY.md §2.1: "Streaming,
watermarks ... absent"; nearest analog is vineyard stream loading,
loader.py:117-123).  A web-scale crawl pipeline does need one — new
WARC batches arrive continuously — so this module provides the
incremental ingestion pattern: file-source readStream → event-time
windowed aggregation with a watermark for late data → sink.

Batch/stream parity: :func:`windowed_event_counts` is expressed over a
plain DataFrame, so the SAME transformation runs in batch mode (tested
against the DuckDB oracle via __spark_entry__) and in streaming mode
(readStream + availableNow trigger, tested in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + value sums per event_type.

    Works identically on batch and streaming DataFrames (the watermark
    is a no-op in batch mode)."""
    with_wm = events.withWatermark("ts", "1 hour") if events.isStreaming else events
    return (
        with_wm.groupBy(
            F.window("ts", window).alias("win"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_events(spark: SparkSession, path_glob: str) -> DataFrame:
    """File-source stream over parquet event files (new files = new
    micro-batches; at scale this is the WARC-batch arrival pattern)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path_glob)
    )
