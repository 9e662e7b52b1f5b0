"""End-to-end pipeline jobs (SURVEY §3): crawl-status accounting,
completeness gating, the analytical matrix export, and the composed
training-data curation funnel."""

from palegislature_spark.pipelines.curate import (
    compact_curated,
    curate_documents,
    quality_signals,
)
from palegislature_spark.pipelines.status import complete_keys, crawl_statuses
from palegislature_spark.pipelines.dump import (
    export_matrices,
    matrix_columns,
    ordered_rolls,
    vote_matrix,
)

__all__ = [
    "compact_curated",
    "complete_keys",
    "crawl_statuses",
    "curate_documents",
    "export_matrices",
    "matrix_columns",
    "ordered_rolls",
    "quality_signals",
    "vote_matrix",
]
