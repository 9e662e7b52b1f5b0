"""Name normalization and parsing (SURVEY §2.7 F1/F2).

F1 — the reference's ``advanced_decapitalization`` (``crawl.py:223-243``)
is a per-character state machine ("BRIAN McRAE" -> "Brian McRae";
all-caps strings fall back to Python ``str.title()``). ``initcap``
cannot express either path (title() breaks words on ANY non-alpha,
initcap only on spaces; the mixed-case path preserves interior caps
after lowercase), so both are built as ``aggregate`` folds over the
character array — JVM-side, no Python UDF; the lambda is interpreted
but bounded by name length.

F2 — the reference parses names with the ``nameparser`` package
(``crawl.py:246-261``). We implement the deterministic subset its
inputs actually need ("Last", "Last, First Middle...", "First Middle
Last", trailing generational suffix) as pure column expressions
returning a ``{first, middle, last, suffix}`` struct.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from palegislature_spark.functions.expr_util import let

_SUFFIXES = ["jr", "jr.", "sr", "sr.", "ii", "iii", "iv", "v"]


def _chars(col: Column) -> Column:
    # split('abc', '') -> ['a','b','c'] plus a trailing '' on some
    # versions; drop empties defensively.
    return F.filter(F.split(col, ""), lambda c: c != "")


def _fold(col: Column, emit, next_state, init_state: bool) -> Column:
    """Fold chars with a (text, bool-state) accumulator."""
    return F.aggregate(
        _chars(col),
        F.struct(F.lit("").alias("s"), F.lit(init_state).alias("flag")),
        lambda acc, c: F.struct(
            F.concat(acc["s"], emit(acc["flag"], c)).alias("s"),
            next_state(c).alias("flag"),
        ),
        lambda acc: acc["s"],
    )


def python_title(col: Column | str) -> Column:
    """Python ``str.title()``: capitalize the first ALPHA char of each
    run, where runs break on any non-alpha ("O'BRIEN" -> "O'Brien",
    "COOK-ARTIS" -> "Cook-Artis")."""
    col = F.col(col) if isinstance(col, str) else col
    is_alpha = lambda c: c.rlike("^[A-Za-z]$")  # noqa: E731
    return _fold(
        col,
        emit=lambda prev_alpha, c: F.when(~is_alpha(c), c)
        .when(~prev_alpha, F.upper(c))
        .otherwise(F.lower(c)),
        next_state=is_alpha,
        init_state=False,
    )


def advanced_decapitalization(col: Column | str) -> Column:
    """``crawl.py:227-243`` semantics, exactly.

    All-caps input (no lowercase letter anywhere) -> ``title()``.
    Mixed case -> state machine: lowercase/space chars pass through and
    arm capitalization; the next armed char is uppercased; every other
    char is lowercased ("BRIAN McRAE" -> "Brian McRae").
    """
    col = F.col(col) if isinstance(col, str) else col
    is_reset = lambda c: c.rlike("^[a-z ]$")  # noqa: E731
    mixed = _fold(
        col,
        emit=lambda armed, c: F.when(is_reset(c), c)
        .when(armed, F.upper(c))
        .otherwise(F.lower(c)),
        next_state=is_reset,
        init_state=True,
    )
    return F.when(col.rlike("^[^a-z]+$"), python_title(col)).otherwise(mixed)


def _split_suffix(tokens: Column) -> Column:
    """tokens -> struct(body array, suffix string|null)."""
    last_tok = F.element_at(tokens, -1)
    has_suffix = (F.size(tokens) > 1) & F.lower(last_tok).isin(_SUFFIXES)
    return F.struct(
        F.when(has_suffix, F.slice(tokens, 1, F.size(tokens) - 1))
        .otherwise(tokens)
        .alias("body"),
        F.when(has_suffix, last_tok).alias("suffix"),
    )


def _first_middle(body: Column) -> Column:
    """body tokens (first [middle...]) -> struct(first, middle)."""
    return F.struct(
        F.when(F.size(body) >= 1, F.element_at(body, 1)).alias("first"),
        F.when(F.size(body) >= 2, F.array_join(F.slice(body, 2, 100), " ")).alias(
            "middle"
        ),
    )


def _comma_form(s: Column) -> Column:
    """"Last, First Middle... [Suffix]" -> name struct."""
    return let(
        _split_suffix(F.split(F.trim(F.substring_index(s, ",", -1)), " ")),
        lambda tok: let(
            _first_middle(tok["body"]),
            lambda fm: F.struct(
                fm["first"].alias("first"),
                fm["middle"].alias("middle"),
                F.trim(F.substring_index(s, ",", 1)).alias("last"),
                tok["suffix"].alias("suffix"),
            ),
        ),
    )


def _plain_form(s: Column) -> Column:
    """"First Middle... Last [Suffix]" / bare "Last" -> name struct."""
    return let(
        _split_suffix(F.split(s, " ")),
        lambda tok: let(
            tok["body"],
            lambda body: let(
                _first_middle(
                    F.when(
                        F.size(body) > 1, F.slice(body, 1, F.size(body) - 1)
                    ).otherwise(F.array().cast("array<string>"))
                ),
                lambda fm: F.struct(
                    fm["first"].alias("first"),
                    fm["middle"].alias("middle"),
                    F.element_at(body, -1).alias("last"),
                    tok["suffix"].alias("suffix"),
                ),
            ),
        ),
    )


def get_name_struct(col: Column | str) -> Column:
    """``get_name_dict`` (``crawl.py:246-261``): decapitalize when the
    raw string contains two consecutive capitals (TWO_CAPS search),
    then parse to the name struct."""
    col = F.col(col) if isinstance(col, str) else col
    return let(
        F.when(col.rlike("[A-Z]{2}"), advanced_decapitalization(col)).otherwise(col),
        parse_name,
    )


def parse_name(col: Column | str) -> Column:
    """Parse a display name into struct(first, middle, last, suffix).

    Handles the reference corpus's shapes (``crawl.py:246-261``,
    ``edits.yaml:118-147``): "SMITH" (bare surname -> last only),
    "Last, First [Middle...] [Suffix]", "First [Middle...] Last
    [Suffix]". A trailing generational suffix (Jr/Sr/II-V, with or
    without dot) is split off. Empty components are NULL.

    Built with let-bindings (functions.expr_util) so each stage of
    the parse is a small shared subtree — without them the composed
    expression copies the whole upstream parse per field reference
    and Catalyst analysis time explodes multiplicatively.
    """
    col = F.col(col) if isinstance(col, str) else col
    return let(
        F.regexp_replace(F.trim(col), r"\s+", " "),
        lambda s: let(
            F.when(s.contains(","), _comma_form(s)).otherwise(_plain_form(s)),
            # Normalize empties to NULL (reference: `hn.middle or None`).
            lambda chosen: F.struct(
                F.nullif(chosen["first"], F.lit("")).alias("first"),
                F.nullif(chosen["middle"], F.lit("")).alias("middle"),
                F.nullif(chosen["last"], F.lit("")).alias("last"),
                F.nullif(chosen["suffix"], F.lit("")).alias("suffix"),
            ),
        ),
    )
