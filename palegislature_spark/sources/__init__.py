"""Sources and sinks (SURVEY §2.1): merge-by-key writes, rulebook
YAML config, incremental work queues."""

from palegislature_spark.sources.merge import (
    compact_files,
    merge_by_key,
    overwrite_updates,
    read_snapshot,
    snapshot_diff,
    upsert_parquet,
    upsert_parquet_rowlevel,
    vacuum,
)
from palegislature_spark.sources.matrix_load import load_matrix_csv
from palegislature_spark.sources.rules import (
    load_edits,
    member_rename_rules,
    service_rules,
    vote_rename_rules,
)
from palegislature_spark.sources.queue import stale_items, work_queue
from palegislature_spark.sources.skipping import (
    file_stats,
    pruned_read,
    write_range_clustered,
)

__all__ = [
    "compact_files",
    "file_stats",
    "load_edits",
    "load_matrix_csv",
    "member_rename_rules",
    "merge_by_key",
    "pruned_read",
    "overwrite_updates",
    "read_snapshot",
    "service_rules",
    "snapshot_diff",
    "stale_items",
    "upsert_parquet",
    "upsert_parquet_rowlevel",
    "vacuum",
    "vote_rename_rules",
    "work_queue",
    "write_range_clustered",
]
