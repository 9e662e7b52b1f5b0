"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the conf set below is chosen so the
same logical plans survive a 1000-executor cluster: AQE on (runtime
partition coalescing + skew-join splitting), broadcast threshold high
enough to catch every dimension table in the star/snowflake schemas,
Arrow enabled for the pandas-UDF slow path, and UTC session time so
results are reproducible against external oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    # Shuffle sizing: ~cores locally; AQE coalesces the tail at runtime.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Every dim table (region/nation/customer/supplier/part, members/
    # service/roll_calls) is far below this — force broadcast joins.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Partition-overwrite discipline for the merge-by-key writer
    # (SURVEY §1.4 / §4.3.5): only rewrite touched partitions.
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "palegislature_spark", **extra: str) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's default confs."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.master(
        os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    ).appName(app_name)
    # local-mode driver heap bound (default 1g) is the first thing to
    # fall over when verification collects 10x-scale results; honored
    # only if set BEFORE the JVM launches, so thread it through here
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    for key, value in {**DEFAULT_CONFS, **extra}.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone to UTC.

    Query functions that format or bucket timestamps call this so the
    result is stable regardless of which session the driver hands us
    (Spark renders timestamps in session-local time; the DuckDB oracle
    is UTC-naive).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
