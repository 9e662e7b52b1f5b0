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


def _hadoop_fs(spark: SparkSession, path: str):
    """Hadoop FileSystem + Path class for ``path``'s scheme (works for
    file:, hdfs:, s3a: alike — the swap logic below is scheme-agnostic)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(
        jvm.java.net.URI.create(path), conf
    )
    return fs, jvm.org.apache.hadoop.fs.Path


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

    First write creates the dataset. With ``partition_cols``, only
    partitions that appear in ``updates`` are rewritten — existing
    rows of touched partitions are merged in, untouched partitions
    are untouched.

    Durability: the merged output is fully written to a staging
    directory *next to* the dataset, then swapped in with O(1)
    filesystem renames (per touched partition when partitioned,
    whole-dataset otherwise).  The live data is never deleted before
    its replacement is durable — a crash mid-job leaves the previous
    dataset intact, and a crash mid-swap leaves every partition at
    either its old or its new complete state.  This also removes the
    read-then-overwrite-same-path cycle, so no checkpoint barrier is
    needed at all (the r1 design localCheckpoint'ed and overwrote in
    place: executor loss or mid-write failure could destroy the
    dataset — see ADVICE r1).
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

    if not exists:
        writer = merged.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(path)
        return

    base = path.rstrip("/")
    staging = base + ".__staging__"
    fs, HPath = _hadoop_fs(spark, base)
    fs.delete(HPath(staging), True)

    writer = merged.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)

    if partition_cols:
        _swap_partitions(fs, HPath, staging, base, len(partition_cols))
        fs.delete(HPath(staging), True)
    else:
        trash = base + ".__old__"
        fs.delete(HPath(trash), True)
        fs.rename(HPath(base), HPath(trash))
        fs.rename(HPath(staging), HPath(base))
        fs.delete(HPath(trash), True)


def _swap_partitions(fs, HPath, staging: str, live: str, depth: int) -> None:
    """Move every ``col=value/.../col=value`` leaf directory written
    under ``staging`` into ``live``, replacing the old partition dir.
    Each swap is one delete + one rename of a complete directory."""

    def leaves(dir_path: str, level: int) -> list[str]:
        out = []
        for st in fs.listStatus(HPath(dir_path)):
            name = st.getPath().getName()
            if not st.isDirectory() or "=" not in name:
                continue
            child = f"{dir_path}/{name}"
            if level == 1:
                out.append(child)
            else:
                out.extend(leaves(child, level - 1))
        return out

    for src in leaves(staging, depth):
        rel = src[len(staging) + 1 :]
        dst = f"{live}/{rel}"
        parent = dst.rsplit("/", 1)[0]
        fs.mkdirs(HPath(parent))
        fs.delete(HPath(dst), True)
        fs.rename(HPath(src), HPath(dst))


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
