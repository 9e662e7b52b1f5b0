"""Gaps-and-islands (sessionization over discrete units).

The reference's ``condense()`` collapses a sorted list of service
years into "start-end" runs in a Python loop (``crawl.py:509-530``).
The distributed form is the classic window trick: ``unit -
row_number()`` is constant within a run of consecutive units, so it
serves as the island key.

Scale: one shuffle (window partition by key) + one aggregation on the
same partitioning — Catalyst reuses the exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def date_islands(
    df: DataFrame, partition_cols: Sequence[str], date_col: str
) -> DataFrame:
    """Collapse per-key sets of dates into runs of consecutive days.

    Returns one row per (partition_cols..., island) with
    ``island_start``, ``island_end`` (dates) and ``n_days``.
    """
    partition_cols = list(partition_cols)
    distinct = df.select(*partition_cols, F.col(date_col).alias("__d")).distinct()
    w = Window.partitionBy(*partition_cols).orderBy("__d")
    keyed = distinct.withColumn(
        "__island", F.date_sub(F.col("__d"), F.row_number().over(w))
    )
    return keyed.groupBy(*partition_cols, "__island").agg(
        F.min("__d").alias("island_start"),
        F.max("__d").alias("island_end"),
        F.count(F.lit(1)).alias("n_days"),
    ).drop("__island")


def int_islands(
    df: DataFrame, partition_cols: Sequence[str], int_col: str
) -> DataFrame:
    """Integer variant (service years): runs of consecutive integers.

    This is the direct ``condense()`` analogue; ``crawl.py:509-530``.
    """
    partition_cols = list(partition_cols)
    distinct = df.select(*partition_cols, F.col(int_col).alias("__v")).distinct()
    w = Window.partitionBy(*partition_cols).orderBy("__v")
    keyed = distinct.withColumn(
        "__island", F.col("__v") - F.row_number().over(w)
    )
    return keyed.groupBy(*partition_cols, "__island").agg(
        F.min("__v").alias("run_start"),
        F.max("__v").alias("run_end"),
        F.count(F.lit(1)).alias("run_len"),
    ).drop("__island")


def condense(df: DataFrame, partition_cols: Sequence[str], int_col: str) -> DataFrame:
    """Render runs as the reference's display form: "2007-2010, 2013".

    Single-value runs render bare; multi-value runs as "start-end",
    joined in ascending order (``crawl.py:509-530`` semantics).
    """
    runs = int_islands(df, partition_cols, int_col)
    label = F.when(
        F.col("run_start") == F.col("run_end"), F.col("run_start").cast("string")
    ).otherwise(F.concat_ws("-", "run_start", "run_end"))
    per_run = runs.select(*partition_cols, F.col("run_start").alias("__ord"), label.alias("__lbl"))
    return per_run.groupBy(*partition_cols).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__ord"), F.col("__lbl")))
                ),
                lambda s: s["__lbl"],
            ),
            ", ",
        ).alias("runs")
    )
