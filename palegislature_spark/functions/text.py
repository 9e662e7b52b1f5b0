"""String/regex/URL scalar functions (SURVEY §2.7 F3/F8/F9).

Reference sites: party "(D)" and district "District 17" extraction
(``crawl.py:369-375,480-492``), non-breaking-space cleanup
(``crawl.py:106-107,401``), bio-link query-parameter parsing
(``crawl.py:156-158,310-312``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def extract_party(col: Column | str) -> Column:
    """Single-letter party code from a "(D)"-style span; NULL if absent."""
    return F.nullif(F.regexp_extract(_c(col), r"\((.)\)", 1), F.lit(""))


def extract_district(col: Column | str) -> Column:
    """District number from a "District 17"-style span; NULL if absent."""
    return F.nullif(
        F.regexp_extract(_c(col), r"District (\d+)", 1), F.lit("")
    ).try_cast("int")


def clean_ws(col: Column | str) -> Column:
    """Trim + collapse whitespace incl. non-breaking spaces (\\xa0)."""
    return F.trim(F.regexp_replace(_c(col), r"[\s ]+", " "))


def url_param(col: Column | str, name: str) -> Column:
    """Query-string parameter value from a URL; NULL if absent."""
    return F.parse_url(_c(col), F.lit("QUERY"), F.lit(name))
