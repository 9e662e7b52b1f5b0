"""Streaming jobs over event streams (SURVEY §2.10).

The reference has no streaming; its incremental seam is the
``last_crawl`` work-queue protocol (Q5 — ``crawl.py:657-737``).
These jobs expose the Structured Streaming equivalents the north
star asks for: watermarked tumbling/sliding/session windows,
dedup-within-watermark, and an incremental merge sink
(``foreachBatch`` + merge-by-key upsert = the distributed
``db.update`` loop).

Design notes for scale:
  * every aggregation is keyed by (window, key) — state store
    partitions on the same shuffle key, watermark bounds state size;
  * the file source with ``maxFilesPerTrigger`` gives bounded,
    replayable micro-batches; ``Trigger.AvailableNow`` drains a
    backlog with the same bounded batches then stops — the Q5
    "process what's new, in caps" protocol;
  * sinks go through foreachBatch -> upsert_parquet so replays are
    idempotent (exactly-once effect on keyed tables).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from palegislature_spark.sources.merge import upsert_parquet


def read_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream with an explicit schema (never inferred)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def tumbling_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window counts + value sum per key."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    keys: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Watermarked sliding-window counts per key."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n",
        )
    )


def session_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    keys: Sequence[str] = ("user_id",),
) -> DataFrame:
    """Watermarked session windows (gap-based) per key."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            "n_events",
        )
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Drop duplicate events by key among rows within the watermark.

    Uses ``dropDuplicatesWithinWatermark`` so state for a key is
    evicted once the watermark passes it — bounded state at any
    input scale (plain dropDuplicates on a stream keeps keys
    forever).
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_upsert_parquet(
    stream: DataFrame,
    path: str,
    keys: Sequence[str],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental merge sink: each micro-batch upserts by key into a
    Parquet dataset (foreachBatch + upsert_parquet) — idempotent under
    replay, the streaming analogue of the reference's upsert loop.
    Durability comes from upsert_parquet's staging-dir + rename swap:
    a batch that dies mid-write leaves the prior dataset intact, so
    the replayed batch re-reads real existing data instead of
    silently starting from nothing (ADVICE r1).
    """
    keys = list(keys)

    def sink(batch: DataFrame, batch_id: int) -> None:
        upsert_parquet(batch.sparkSession, path, batch, keys)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_available_now(
    result: DataFrame,
    checkpoint_dir: str,
    queryName: str,
    output_mode: str = "append",
) -> StreamingQuery:
    """Drain the backlog into an in-memory table and stop (tests/dev)."""
    return (
        result.writeStream.format("memory")
        .queryName(queryName)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
