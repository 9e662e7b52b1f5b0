"""Enum codecs (SURVEY §1.2 / §2.7 F4).

Reference semantics:
  * Vote: YEA=1 NAY=2 NO_VOTE=3 LEAVE=4, bidirectional letter codec
    Y/N/X/E (``pa_legislature.py:26-41``); blank/absent = NULL
    ("no record", ``README.md:27``).
  * Chamber: HOUSE=1 SENATE=2, from the first letter
    (``pa_legislature.py:7-17``).
  * Party: single-letter code to full name (``crawl.py:371-375``).

All codecs are map-literal lookups (whole-stage codegen); unknown
inputs yield NULL rather than raising — validation is a separate
stage (SURVEY §5.1 maps the reference's hard-fails to violation
DataFrames).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F

VOTE_LETTERS: dict[str, int] = {"Y": 1, "N": 2, "X": 3, "E": 4}
CHAMBER_NAMES: dict[int, str] = {1: "House", 2: "Senate"}
PARTY_CODES: dict[str, str] = {
    "D": "Democrat",
    "R": "Republican",
    "I": "Independent",
}


def _map_literal(mapping: dict) -> Column:
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])


def vote_from_letter(col: Column | str) -> Column:
    """'Y'/'N'/'X'/'E' -> 1/2/3/4; anything else (incl. blank) -> NULL."""
    return _map_literal(VOTE_LETTERS)[F.col(col) if isinstance(col, str) else col]


def vote_to_letter(col: Column | str) -> Column:
    """1/2/3/4 -> 'Y'/'N'/'X'/'E'; NULL/unknown -> NULL (blank cell)."""
    inverse = {v: k for k, v in VOTE_LETTERS.items()}
    return _map_literal(inverse)[F.col(col) if isinstance(col, str) else col]


def chamber_from_letter(col: Column | str) -> Column:
    """First letter H -> 1 (House), S -> 2 (Senate); else NULL."""
    c = F.upper(F.substring(F.col(col) if isinstance(col, str) else col, 1, 1))
    return F.when(c == "H", F.lit(1)).when(c == "S", F.lit(2))


def chamber_to_name(col: Column | str) -> Column:
    """1 -> 'House', 2 -> 'Senate' (the enum's str(), title-cased)."""
    return _map_literal(CHAMBER_NAMES)[F.col(col) if isinstance(col, str) else col]


def party_name(col: Column | str) -> Column:
    """'D'/'R'/'I' -> full party name; unknown -> NULL."""
    return _map_literal(PARTY_CODES)[F.col(col) if isinstance(col, str) else col]
