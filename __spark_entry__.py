"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` exposes the
full declared inventory (one entry per implemented operator family
from SURVEY.md §2 plus the training-data-pipeline extensions);
``oracle_sql()`` provides the DuckDB-equivalent SQL for every query —
the approximate operators included (knn_lsh / knn_ivf embed their
deterministic plane matrices / centroid picks / Lloyd iteration as
replayable SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from palegislature_spark.queries import REGISTRY

FLAGSHIP = "q1_pricing_summary"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted => rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in sorted(REGISTRY.items())
        if spec.oracle is not None
    }
