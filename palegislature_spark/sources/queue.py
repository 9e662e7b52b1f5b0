"""Incremental work queues (Q5 — ``crawl.py:657-737``).

The reference's crawl protocol: process items whose ``last_crawl`` is
NULL (never crawled) or older than a staleness window, in a stable
order, capped per run. Both shapes are top-k scans — Catalyst plans
``orderBy().limit()`` as TakeOrderedAndProject, no full sort.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def work_queue(
    df: DataFrame,
    order_by: Sequence[Column | str],
    limit: int,
    crawl_col: str = "last_crawl",
) -> DataFrame:
    """Uncrawled items (``crawl_col IS NULL``), ordered, capped."""
    return df.filter(F.col(crawl_col).isNull()).orderBy(*order_by).limit(limit)


def stale_items(
    df: DataFrame,
    max_age: dt.timedelta,
    now: dt.datetime,
    crawl_col: str = "last_crawl",
) -> DataFrame:
    """Items never crawled or crawled before ``now - max_age``
    (``crawl.py:676-678`` sessions, ``:724-726`` member lists)."""
    cutoff = now - max_age
    return df.filter(
        F.col(crawl_col).isNull() | (F.col(crawl_col) < F.lit(cutoff))
    )
