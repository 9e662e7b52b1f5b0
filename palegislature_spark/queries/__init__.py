"""Declared query inventory.

Every operator family in SURVEY §2 (plus the training-data-pipeline
extensions) is exercised by at least one registered query. Each query
is a ``(spark, sf_dir) -> DataFrame`` callable with, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle SQL string the
driver hash-compares against at sf0.01.

Import side effect: importing this package loads every query module so
``REGISTRY`` is fully populated.
"""

from __future__ import annotations

from palegislature_spark.queries.registry import REGISTRY, QuerySpec, register

# Populate the registry.
from palegislature_spark.queries import relational as _relational  # noqa: E402,F401
from palegislature_spark.queries import events as _events  # noqa: E402,F401
from palegislature_spark.queries import text as _text  # noqa: E402,F401
from palegislature_spark.queries import vectors as _vectors  # noqa: E402,F401
from palegislature_spark.queries import er as _er  # noqa: E402,F401
from palegislature_spark.queries import ingest as _ingest  # noqa: E402,F401
from palegislature_spark.queries import surface as _surface  # noqa: E402,F401
from palegislature_spark.queries import corpus as _corpus  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register"]
