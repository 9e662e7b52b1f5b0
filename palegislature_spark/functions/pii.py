"""PII detection and redaction — the privacy scrub stage of a
training-data pipeline.

Pre-training corpora are routinely scrubbed of emails, phone numbers
and IP addresses before the data is retained or trained on; this is
the standard regex pass (the conservative patterns below favor recall
on well-formed PII over exhaustiveness — swap in stricter ones per
policy). Everything is built-in `regexp_*` — one linear codegen pass,
no UDF.

Engine-portability notes, learned the hard way:
* patterns stay inside RE2's dialect (character classes, ``\\b``,
  bounded repetition — no lookbehind) so the DuckDB oracle runs the
  IDENTICAL pattern;
* Spark-side calls use the COLUMN API (``F.regexp_extract_all(col,
  F.lit(pat))``), never ``F.expr`` — SQL string literals eat
  backslashes (``\\b`` becomes backspace) and silently change the
  pattern;
* redaction applies in a fixed order (email, phone, ip) so engines
  agree on overlapping matches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# ordered: applied in this sequence during redaction
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    ("ip", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)


def pii_count(text_col: str, kind: str) -> F.Column:
    """Number of matches of one PII kind in the column."""
    for name, pat, _ in PII_PATTERNS:
        if name == kind:
            return F.size(F.regexp_extract_all(text_col, F.lit(pat), 0))
    raise KeyError(kind)


def redact_pii(text_col: str) -> F.Column:
    """Text with every PII match replaced by its tag, in the fixed
    pattern order."""
    col = F.col(text_col)
    for _, pat, tag in PII_PATTERNS:
        col = F.regexp_replace(col, pat, tag)
    return col
