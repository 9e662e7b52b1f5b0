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


# Stopword profiles for the language-ID heuristic: the highest-
# frequency function words per language (public-domain common-word
# lists). Small on purpose — function words dominate running text, so
# a dozen per language separates these languages reliably, and the
# whole profile table compiles into one codegen'd when-chain.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for", "was", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "den", "von", "mit"),
    "fr": ("le", "la", "les", "et", "est", "une", "des", "du", "que", "pas", "pour", "dans"),
    "es": ("el", "la", "los", "las", "y", "es", "una", "que", "no", "por", "para", "con"),
}


def lang_id_profile(
    col: Column | str, profiles: dict[str, tuple[str, ...]] | None = None
) -> Column:
    """Stopword-profile language ID: fraction of tokens found in each
    language's function-word set; the max-scoring language wins,
    'und' (undetermined) when nothing scores.

    Pure Column expressions — one lowercase+split pass, one
    size(filter(...)) per language, a greatest() comparison — so the
    classifier is whole-stage-codegen and linear in text length, the
    scale path for corpus-wide language partitioning.  Ties break by
    profile order (dict order above), pinned by tests/test_text.py.
    """
    profiles = profiles or LANG_PROFILES
    toks = F.split(F.lower(_c(col)), r"[\s ]+")
    n = F.size(toks)
    scores = {
        lang: F.size(F.filter(toks, lambda w: w.isin(*stops))) / n
        for lang, stops in profiles.items()
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # reversed: earlier profiles win ties because later whens wrap outer
    for lang in reversed(list(profiles)):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best > 0, out).otherwise(F.lit("und"))
