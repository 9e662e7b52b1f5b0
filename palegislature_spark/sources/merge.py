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


def upsert_parquet_rowlevel(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: Sequence[str],
    version_col: str | None = None,
) -> dict:
    """Row-level copy-on-write MERGE over plain Parquet.

    ``upsert_parquet`` rewrites whole partitions, which is the right
    grain only when update keys align with the partition layout.  This
    is the non-aligned path — the mechanics a table format (Delta /
    Iceberg MERGE) provides, hand-rolled on the open file format:

    1. probe which data FILES contain an updated key (left-semi join
       against ``_metadata.file_path`` — file-level pruning, the
       hidden-column analogue of Delta's min/max file skipping);
    2. rewrite ONLY those files, merged with the updates (new keys
       ride along into the rewritten output);
    3. publish the replacement files into the live directory, then
       delete the superseded originals.

    Every untouched file stays byte-identical — at 100 TB an update
    touching 0.1% of keys rewrites ~0.1% of files instead of every
    partition the keys straddle.

    Durability: replacements are fully written to a staging dir and
    moved in BEFORE the superseded files are deleted, so no data is
    ever lost; a crash inside the publish/delete window can leave
    both versions visible (duplicate keys).  Re-running the same
    merge heals that state — both copies land in the affected-file
    set and merge-by-key keeps one — but readers needing isolation
    in that window want a real table format; this sink documents the
    convention until one is adopted (SURVEY §1.4).

    Returns {"files_total", "files_rewritten", "rows_written"}.
    """
    keys = list(keys)
    try:
        tgt = spark.read.parquet(path)
        exists = True
    except Exception:  # noqa: BLE001 — first write: no dataset yet
        exists = False
    if not exists:
        deduped = merge_by_key(None, updates, keys, version_col)
        deduped.write.mode("overwrite").parquet(path)
        return {
            "files_total": 0,
            "files_rewritten": 0,
            "rows_written": deduped.count(),
        }

    # _metadata resolves only against the file-source relation itself,
    # so bind it to a regular column before any join/projection
    tgt_f = tgt.select("*", F.col("_metadata.file_path").alias("__file"))
    all_files = {
        r["__file"] for r in tgt_f.select("__file").distinct().collect()
    }
    affected = [
        r["__file"]
        for r in tgt_f.join(
            F.broadcast(updates.select(*keys).distinct()), keys, "left_semi"
        )
        .select("__file")
        .distinct()
        .collect()
    ]

    # rows needing rewrite: only the affected files are even read —
    # the _metadata predicate prunes at file granularity
    touched = tgt_f.filter(F.col("__file").isin(affected)) if affected else None
    merged = merge_by_key(
        touched.select(updates.columns) if touched is not None else None,
        updates,
        keys,
        version_col,
    )

    base = path.rstrip("/")
    staging = base + ".__rowstage__"
    fs, HPath = _hadoop_fs(spark, base)
    fs.delete(HPath(staging), True)
    merged.write.mode("overwrite").parquet(staging)
    # count from staged footers, BEFORE the originals are retired —
    # merged's lineage reads files this merge is about to delete
    rows_written = spark.read.parquet(staging).count()

    # publish new files (uuid part names cannot collide), then retire
    # the superseded ones
    for st in fs.listStatus(HPath(staging)):
        name = st.getPath().getName()
        if name.startswith("part-"):
            fs.rename(st.getPath(), HPath(f"{base}/{name}"))
    fs.delete(HPath(staging), True)
    for f in affected:
        fs.delete(HPath(f), False)

    return {
        "files_total": len(all_files),
        "files_rewritten": len(affected),
        "rows_written": rows_written,
    }
