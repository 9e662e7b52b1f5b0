"""Bucketed tables: shuffle-free co-located joins (SURVEY M5, the
'co-locate joins via bucketing' scale lever).

A fact table bucketed by its join key joins another table bucketed
the same way WITHOUT a shuffle on either side — the exchange
disappears from the plan because both children already satisfy the
required hash distribution. At 100 TB this converts the dominant
fact-fact join from a full network shuffle into local merge work.

Bucketing requires a saveAsTable catalog entry (bucket metadata lives
in the metastore); local tests use the default in-place Derby
metastore + spark.sql.warehouse.dir.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the
    plan contains no Exchange on either join child."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def has_shuffle_before_join(df: DataFrame) -> bool:
    """True if the physical plan shuffles either child of its first
    join — the assertion bucketing exists to falsify."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_at = None
    for marker in ("SortMergeJoin", "ShuffledHashJoin"):
        idx = plan.find(marker)
        if idx != -1:
            join_at = idx if join_at is None else min(join_at, idx)
    if join_at is None:
        return False
    return "Exchange" in plan[join_at:]
