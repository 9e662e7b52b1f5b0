"""Rollup cascade tests: level-N+1-from-level-N equivalence and
incremental (streaming foreachBatch) refresh of the hourly table."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from palegislature_spark.operators.rollup import (
    daily_from_hourly,
    hourly_rollup,
    refresh_hourly,
)
from palegislature_spark.session import ensure_utc
from tests.conftest import rows

TS = dt.datetime

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

# values are multiples of 0.25 — exactly representable, so sums and
# the 2-dp round are exact and refresh-vs-recompute compares with ==
B1 = [
    (1, TS(2024, 1, 1, 10, 5), "click", 1.25),
    (2, TS(2024, 1, 1, 10, 40), "click", 2.5),
    (3, TS(2024, 1, 1, 11, 10), "buy", 10.0),
    (4, TS(2024, 1, 2, 9, 0), "click", 0.75),
]
B2 = [
    (5, TS(2024, 1, 1, 10, 59), "click", 4.0),  # late: re-merges 10:00
    (6, TS(2024, 1, 1, 12, 30), "buy", 20.25),
    (7, TS(2024, 1, 2, 9, 30), "click", 1.0),
]


def test_daily_from_hourly_equals_direct_daily_counts(spark):
    ensure_utc(spark)
    ev = spark.createDataFrame(B1 + B2, SCHEMA)
    daily = daily_from_hourly(hourly_rollup(ev))
    direct = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    got = rows(daily, "day", "event_type", "n_events", "total_value")
    want = rows(direct, "day", "event_type", "n_events", "total_value")
    # exact here (quarter values); in general counts are exact and
    # totals agree to the cascade's per-hour rounding
    assert got == want


def test_refresh_hourly_incremental_equals_recompute(spark, tmp_path):
    ensure_utc(spark)
    path = str(tmp_path / "hourly")
    refresh_hourly(spark, path, spark.createDataFrame(B1, SCHEMA))
    refresh_hourly(spark, path, spark.createDataFrame(B2, SCHEMA))
    got = rows(
        spark.read.parquet(path),
        "hour",
        "event_type",
        "n_events",
        "total_value",
    )
    want = rows(
        hourly_rollup(spark.createDataFrame(B1 + B2, SCHEMA)),
        "hour",
        "event_type",
        "n_events",
        "total_value",
    )
    assert got == want
    # the late event in B2 re-merged into the existing 10:00 row
    ten = [r for r in got if r[0].hour == 10][0]
    assert ten[2] == 3 and ten[3] == 7.75


def test_refresh_hourly_replay_is_noop(spark, tmp_path):
    """foreachBatch is at-least-once: replaying an already-merged
    batch_id must not double-count (ADVICE r5 — additive merges need
    explicit idempotence; key-level last_batch stamps provide it)."""
    ensure_utc(spark)
    path = str(tmp_path / "hourly_replay")
    refresh_hourly(spark, path, spark.createDataFrame(B1, SCHEMA), batch_id=0)
    refresh_hourly(spark, path, spark.createDataFrame(B2, SCHEMA), batch_id=1)
    before = rows(
        spark.read.parquet(path), "hour", "event_type", "n_events", "total_value"
    )
    # replay the last batch (crash between sink completion and
    # checkpoint commit)
    refresh_hourly(spark, path, spark.createDataFrame(B2, SCHEMA), batch_id=1)
    after = rows(
        spark.read.parquet(path), "hour", "event_type", "n_events", "total_value"
    )
    assert after == before
    # ...and a genuinely NEW batch with the same rows still merges
    refresh_hourly(spark, path, spark.createDataFrame(B2, SCHEMA), batch_id=2)
    ten = [
        r
        for r in rows(spark.read.parquet(path), "hour", "event_type", "n_events")
        if r[0].hour == 10
    ][0]
    assert ten[2] == 4  # 3 from B1+B2 plus the late click again


def test_refresh_hourly_from_real_stream(spark, tmp_path):
    """foreachBatch-driven continuous aggregate: streaming refresh
    over two micro-batches ends at the same hourly table as a batch
    build over all events."""
    ensure_utc(spark)
    src = tmp_path / "events_stream"
    for b in (B1, B2):
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    table = str(tmp_path / "hourly_stream")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    from palegislature_spark.streaming.jobs import hourly_rollup_stream

    q = hourly_rollup_stream(stream, table, str(tmp_path / "cp_rollup"))
    q.awaitTermination(120)
    got = rows(
        spark.read.parquet(table),
        "hour",
        "event_type",
        "n_events",
        "total_value",
    )
    want = rows(
        hourly_rollup(spark.createDataFrame(B1 + B2, SCHEMA)),
        "hour",
        "event_type",
        "n_events",
        "total_value",
    )
    assert got == want


def test_refresh_hourly_into_pre_upgrade_table(spark, tmp_path):
    """ADVICE r6 (medium): first refresh against a table written BEFORE
    the last_batch column existed must not fail analysis.  merge_by_key
    now fills update-side columns missing from the stored table with
    typed NULLs, so the upgrade happens in-place on first refresh."""
    ensure_utc(spark)
    path = str(tmp_path / "hourly_preupgrade")
    # simulate a pre-upgrade table: the hourly rollup WITHOUT last_batch
    pre = hourly_rollup(spark.createDataFrame(B1, SCHEMA)).withColumn(
        "day", F.to_date("hour")
    )
    assert "last_batch" not in pre.columns
    pre.write.partitionBy("day").parquet(path)
    # first refresh with the stamped schema — used to raise
    # AnalysisException (cannot resolve 'last_batch')
    refresh_hourly(spark, path, spark.createDataFrame(B2, SCHEMA), batch_id=7)
    got = rows(
        spark.read.parquet(path), "hour", "event_type", "n_events", "total_value"
    )
    want = rows(
        hourly_rollup(spark.createDataFrame(B1 + B2, SCHEMA)),
        "hour",
        "event_type",
        "n_events",
        "total_value",
    )
    assert got == want
    # replay of the upgrading batch is still a no-op on touched keys
    refresh_hourly(spark, path, spark.createDataFrame(B2, SCHEMA), batch_id=7)
    assert (
        rows(spark.read.parquet(path), "hour", "event_type", "n_events", "total_value")
        == got
    )
