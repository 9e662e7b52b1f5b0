"""Query registry: name -> (spark callable, optional DuckDB oracle SQL)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None => rows-only check
    covers: str  # SURVEY §2 operator ids this query exercises


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, covers: str, oracle: str | None = None):
    """Decorator registering a query under ``name``.

    ``covers`` cites the SURVEY §2 operator ids the query exercises so
    coverage can be audited mechanically.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, covers=covers)
        return fn

    return deco
