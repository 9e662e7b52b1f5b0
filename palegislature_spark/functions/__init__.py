"""Scalar-function surface (SURVEY §2.7 F1–F10).

Every function returns a Column built from pyspark.sql built-ins —
no Python UDFs — so the expressions stay inside whole-stage codegen
(higher-order lambdas in the name state machines are the one
interpreted exception, bounded by name length).
"""

from palegislature_spark.functions.codecs import (
    CHAMBER_NAMES,
    PARTY_CODES,
    VOTE_LETTERS,
    chamber_from_letter,
    chamber_to_name,
    party_name,
    vote_from_letter,
    vote_to_letter,
)
from palegislature_spark.functions.names import (
    advanced_decapitalization,
    parse_name,
    python_title,
)
from palegislature_spark.functions.temporal import (
    parse_dob,
    parse_month_name,
    year_range_expand,
)
from palegislature_spark.functions.text import (
    LANG_PROFILES,
    clean_ws,
    extract_district,
    extract_party,
    lang_id_profile,
    url_param,
)

__all__ = [
    "CHAMBER_NAMES",
    "PARTY_CODES",
    "VOTE_LETTERS",
    "advanced_decapitalization",
    "chamber_from_letter",
    "chamber_to_name",
    "LANG_PROFILES",
    "clean_ws",
    "extract_district",
    "extract_party",
    "lang_id_profile",
    "parse_dob",
    "parse_month_name",
    "parse_name",
    "party_name",
    "python_title",
    "url_param",
    "vote_from_letter",
    "vote_to_letter",
    "year_range_expand",
]
