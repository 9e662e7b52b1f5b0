"""End-to-end pipeline jobs (SURVEY §3): crawl-status accounting,
completeness gating, and the analytical matrix export."""

from palegislature_spark.pipelines.status import complete_keys, crawl_statuses
from palegislature_spark.pipelines.dump import (
    export_matrices,
    matrix_columns,
    ordered_rolls,
    vote_matrix,
)

__all__ = [
    "complete_keys",
    "crawl_statuses",
    "export_matrices",
    "matrix_columns",
    "ordered_rolls",
    "vote_matrix",
]
