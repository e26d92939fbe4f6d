"""Structured Streaming operators over an events stream.

The reference is a single-shot batch CLI (SURVEY §3.9 — no streaming),
so these are engine additions for the training-data pipeline: a
watermarked tumbling-window aggregate, streaming exact dedup, and a
streaming ingest of pages with the same frozen extractor.  Each
transformation is expressed so the SAME function works on a batch
DataFrame (tests/oracles) and a streaming one (readStream) — the
Structured Streaming contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h window x event_type counts/sums; late rows beyond the
    watermark are dropped (state is bounded — required at stream scale)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total"),
        )
        .select(
            # NTZ timestamps can't cast straight to long — hop through LTZ
            # (session tz is UTC, so the epoch is unambiguous)
            F.col("w.start").cast("timestamp").cast("long").alias("hour_epoch"),
            "event_type", "n", "total",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event ids within the watermark horizon
    (dropDuplicates with bounded state)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.dropDuplicates(["event_id"])


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, lang string"


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """Streaming ingest of the Common-Crawl-style pages table; compose
    with ``sources.dataset.from_pages`` — the SAME frozen extractor runs
    unchanged on the micro-batches (mapInPandas is streaming-safe)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def run_to_memory_sink(
    stream_df: DataFrame, name: str, output_mode: str = "append"
):
    """Test helper: drain a (file-backed) stream into an in-memory table
    and block until every available input is processed."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
