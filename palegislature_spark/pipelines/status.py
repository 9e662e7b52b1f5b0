"""Crawl-status accounting + completeness gates (Q4, A3/A4).

``get_crawl_statuses`` (``pa_legislature.py:51-93``) counts crawled
vs total session-days and roll-calls per (year, chamber) with Python
Counters; here it is one conditional aggregation per table plus a
join — partial aggregation map-side, one shuffle per table on the
(year, chamber) key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crawl_statuses(
    sessions: DataFrame, session_days: DataFrame, roll_calls: DataFrame
) -> DataFrame:
    """(year, chamber, day_total, day_crawled, roll_total,
    roll_crawled, status) — status in {'complete', 'rolls missing',
    'days missing'} (``pa_legislature.py:82-93``; NULL when a group
    has no days or no rolls).
    """
    keys = sessions.select(F.col("id").alias("session_id"), "year", "chamber")
    days = session_days.join(F.broadcast(keys), "session_id").select(
        "year", "chamber", F.col("id").alias("day_id"), "last_crawl"
    )
    day_stats = days.groupBy("year", "chamber").agg(
        F.count(F.lit(1)).alias("day_total"),
        F.sum(F.col("last_crawl").isNotNull().cast("long")).alias("day_crawled"),
    )
    rolls = roll_calls.select("day_id", "last_crawl").join(
        F.broadcast(days.select("day_id", "year", "chamber")), "day_id"
    )
    roll_stats = rolls.groupBy("year", "chamber").agg(
        F.count(F.lit(1)).alias("roll_total"),
        F.sum(F.col("last_crawl").isNotNull().cast("long")).alias("roll_crawled"),
    )
    joined = day_stats.join(roll_stats, ["year", "chamber"], "left").fillna(
        0, ["roll_total", "roll_crawled"]
    )
    status = (
        F.when((F.col("day_total") == 0) | (F.col("roll_total") == 0), F.lit(None))
        .when(
            F.col("day_total") == F.col("day_crawled"),
            F.when(
                F.col("roll_total") == F.col("roll_crawled"), F.lit("complete")
            ).otherwise(F.lit("rolls missing")),
        )
        .otherwise(F.lit("days missing"))
    )
    return joined.withColumn("status", status)


def complete_keys(
    sessions: DataFrame, session_days: DataFrame, roll_calls: DataFrame
) -> DataFrame:
    """(year, chamber) groups safe to export / resolve (status complete)."""
    return (
        crawl_statuses(sessions, session_days, roll_calls)
        .filter("status = 'complete'")
        .select("year", "chamber")
    )
