"""Range-clustered layout + file-level min/max skipping.

The data-skipping half of a table format (Delta/Iceberg file stats,
Parquet row-group pruning one level up), hand-rolled on plain
Parquet the same way ``merge.py`` hand-rolls MERGE:

- :func:`write_range_clustered` lays data out so each file owns a
  disjoint key range (``repartitionByRange`` + in-file sort — the
  one-column form of Z-ordering). Clustering is what MAKES min/max
  stats selective: on a hash-scattered layout every file spans the
  whole key domain and no stat can exclude anything.
- :func:`file_stats` computes the per-file (min, max) sidecar with
  one aggregation over the hidden ``_metadata.file_path`` column —
  the same mechanism the row-level merge uses for file pruning.
- :func:`pruned_read` answers a range predicate by consulting the
  sidecar FIRST and handing Spark only the overlapping files: a
  point/range query on a 100 TB dataset opens the handful of files
  whose range intersects, not every footer in the directory listing.

The sidecar is file-count-sized (like the manifest); refresh it after
a rewrite the same way a table format recommits stats with each
snapshot. On a MANIFEST-managed dataset (``merge.py``), build stats
after :func:`~palegislature_spark.sources.merge.vacuum` (or from
``read_snapshot``'s file list): a plain directory read sees
pending-retire files and would double-count their rows. Selectivity is verified in tests/test_skipping.py: the
pruned read provably opens fewer files (``df.inputFiles()``) while
returning byte-identical results to the full-scan filter.

Reference tie-in: the reference's SQLite gets index range scans for
free (`pa_legislature.yaml` key columns); this is the columnar-file
analogue for the scan-based engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_range_clustered(
    df: DataFrame, path: str, col: str, n_files: int
) -> None:
    """Write ``df`` so each output file owns a (near-)disjoint range
    of ``col``: range-partition into ``n_files`` shards, sort within
    each, one file per shard."""
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(spark: SparkSession, path: str, col: str) -> list[dict]:
    """Per-file stats sidecar: [{file, lo, hi, rows}] — one linear
    scan of the stats column grouped by the hidden file path."""
    rows = (
        spark.read.parquet(path)
        .select(F.col(col).alias("__v"), F.col("_metadata.file_path").alias("__f"))
        .groupBy("__f")
        .agg(
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
            F.count(F.lit(1)).alias("rows"),
        )
        .collect()
    )
    return [
        {"file": r["__f"], "lo": r["lo"], "hi": r["hi"], "rows": r["rows"]}
        for r in rows
    ]


def pruned_read(
    spark: SparkSession,
    path: str,
    stats: list[dict],
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Range query via the stats sidecar: read ONLY files whose
    [lo, hi] overlaps the predicate, then apply the exact filter.
    Correct for any layout (stats bound every file's contents);
    selective when the layout is range-clustered."""
    files = [s["file"] for s in stats if s["hi"] >= lo and s["lo"] <= hi]
    if not files:
        return (
            spark.read.parquet(path)
            .filter(F.lit(False))
        )
    return spark.read.parquet(*files).filter(
        (F.col(col) >= lo) & (F.col(col) <= hi)
    )
