"""Structured Streaming surface (SURVEY §2.10 / M4)."""

from palegislature_spark.streaming.jobs import (
    category_count_stream,
    embedding_list_mass_stream,
    numeric_bin_count_stream,
    cms_heavy_hitter_stream,
    curate_stream,
    decontam_stream,
    dedup_within_watermark,
    read_stream,
    run_available_now,
    session_counts,
    sliding_counts,
    stream_interval_join,
    stream_upsert_parquet,
    tumbling_counts,
    value_transitions,
    value_transitions_tws,
)

__all__ = [
    "category_count_stream",
    "embedding_list_mass_stream",
    "numeric_bin_count_stream",
    "cms_heavy_hitter_stream",
    "curate_stream",
    "decontam_stream",
    "dedup_within_watermark",
    "read_stream",
    "run_available_now",
    "session_counts",
    "sliding_counts",
    "stream_interval_join",
    "stream_upsert_parquet",
    "tumbling_counts",
    "value_transitions",
    "value_transitions_tws",
]
