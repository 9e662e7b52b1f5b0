"""Temporal scalar functions (SURVEY §2.7 F5/F6).

Reference sites: month-name parsing and day-date assembly
(``crawl.py:102-103``), timestamp parse from date+time strings
(``crawl.py:215``), dob extraction from "m/d/yyyy - ..." spans
(``crawl.py:577-581``), year-range expansion "2019-2020" -> [2019,
2020] (``crawl.py:333-342``). The inverse (condense) lives in
``operators.islands.condense``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_month_name(col: Column | str) -> Column:
    """Full English month name -> month number (strptime('%B'))."""
    return F.month(F.try_to_timestamp(F.concat(_c(col), F.lit(" 1 2000")), F.lit("MMMM d yyyy")))


def parse_dob(col: Column | str) -> Column:
    """Date-of-birth from a "m/d/yyyy - ..." life-span string."""
    head = F.trim(F.substring_index(_c(col), "-", 1))
    return F.try_to_timestamp(head, F.lit("M/d/yyyy")).cast("date")


def year_range_expand(col: Column | str) -> Column:
    """"2019-2020" -> [2019, 2020]; bare "2019" -> [2019].

    ``crawl.py:333-342`` semantics (inclusive range). Malformed input
    yields NULL rather than raising.
    """
    col = _c(col)
    start = F.substring_index(col, "-", 1).try_cast("int")
    end = F.substring_index(col, "-", -1).try_cast("int")
    return F.when(
        ~col.contains("-"), F.when(start.isNotNull(), F.array(start))
    ).otherwise(
        F.when(start.isNotNull() & end.isNotNull() & (start <= end), F.sequence(start, end))
    )
