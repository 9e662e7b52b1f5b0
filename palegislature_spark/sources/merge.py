"""Merge-by-key writes over plain Parquet (S7/S8, SURVEY §1.4, §4.3.5).

The reference upserts row-at-a-time through SQLite
(``db.update(table, row, keys)`` — ``crawl.py:77,112,166,206,503``).
The distributed equivalent without a table format is batch merge:
union existing + updates, keep the newest row per key
(``row_number() over (partition by key order by version desc) = 1``),
and rewrite only the touched partitions
(``partitionOverwriteMode=dynamic``, set in session defaults).

Bulk UPDATE (S8 — ``match_names.py:187-188``, ``apply_edits.py``)
is the join-and-coalesce pattern: see ``overwrite_updates``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_by_key(
    existing: DataFrame | None,
    updates: DataFrame,
    keys: Sequence[str],
    version_col: str | None = None,
) -> DataFrame:
    """Upsert semantics: updates win over existing rows per key.

    ``version_col`` (e.g. an ingest timestamp) orders within-batch
    duplicates — highest wins; without it, update-batch rows beat
    existing rows and within-batch duplicates resolve arbitrarily
    but deterministically (row_number, source-tag order).
    """
    keys = list(keys)
    tagged_new = updates.withColumn("__src", F.lit(1))
    if existing is None:
        unioned = tagged_new
    else:
        unioned = existing.select(updates.columns).withColumn(
            "__src", F.lit(0)
        ).unionByName(tagged_new)
    order = [F.col("__src").desc()]
    if version_col:
        order.append(F.col(version_col).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .drop("__src", "__rn")
    )


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: Sequence[str],
    partition_cols: Sequence[str] = (),
    version_col: str | None = None,
) -> None:
    """Merge ``updates`` into the Parquet dataset at ``path``.

    First write creates the dataset. With ``partition_cols`` and the
    session's dynamic partition-overwrite mode, only partitions that
    appear in ``updates`` are rewritten — existing rows of touched
    partitions are merged in, untouched partitions are untouched.
    """
    try:
        existing = spark.read.parquet(path)
        exists = True
    except Exception:  # noqa: BLE001 — first write: no dataset yet
        existing = None
        exists = False

    if exists and partition_cols:
        # only merge rows from partitions present in the update batch
        parts = updates.select(*partition_cols).distinct()
        existing = existing.join(F.broadcast(parts), list(partition_cols), "left_semi")

    merged = merge_by_key(existing, updates, keys, version_col)
    # Rewriting a dataset that is also the read source needs a
    # materialization barrier; localCheckpoint breaks the cycle
    # without a second full write.
    if exists:
        merged = merged.localCheckpoint()
    writer = merged.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def overwrite_updates(
    fact: DataFrame,
    fixes: DataFrame,
    keys: Sequence[str],
    columns: Sequence[str],
) -> DataFrame:
    """Bulk UPDATE as a join: for rows matching ``fixes`` on ``keys``,
    replace ``columns`` with the fix values (NULL fix values keep the
    original — coalesce semantics). All other rows pass through.
    """
    keys = list(keys)
    fx = F.broadcast(
        fixes.select(
            *keys, *[F.col(c).alias(f"__fix_{c}") for c in columns]
        )
    )
    out = fact.join(fx, keys, "left")
    return out.select(
        *[
            F.coalesce(F.col(f"__fix_{c}"), F.col(c)).alias(c)
            if c in columns
            else F.col(c)
            for c in fact.columns
        ]
    )
