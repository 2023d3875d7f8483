"""Structured Streaming surface.

The reference is a batch KV index with incremental upserts (no
watermarks/windows/state — SURVEY.md §2.6 note); Spark adds a native
streaming story, so the rebuild exposes two streaming operators:

- ``stream_ingest_pages``: continuous index ingestion. New page files
  landing in a directory become index *generations* via
  ``foreachBatch(append_docs)`` — streaming checkpoints give
  exactly-once batch handoff, and each micro-batch commits atomically
  through the snapshot catalog, so a crash mid-batch resumes cleanly
  on both the streaming side (offsets) and the index side (manifest).
- ``windowed_event_counts``: tumbling-window aggregation with a
  watermark for late data — the standard streaming-analytics shape over
  the ``events`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import PAGES_SCHEMA
from ..index.build import BuildConfig
from ..index.incremental import append_docs


def stream_ingest_pages(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    config: BuildConfig | None = None,
    available_now: bool = True,
):
    """Index every page file that lands in ``source_dir``. With
    ``available_now`` the query drains what's present and stops (test /
    backfill mode); otherwise it runs continuously."""
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(source_dir)

    def handle_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        append_docs(spark, index_dir, batch_df, config)

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data
    watermarking; feed any streaming source with (ts, event_type, value)."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
