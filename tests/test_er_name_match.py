"""Name-match semantics tests (names.py:96-149 fidelity pins).

Cases come from the reference's own dirty data (edits.yaml,
FIXTURES.md §1): nicknames, initials, F.-Scott swaps, hyphenated
surnames, suffix conflicts, title-case reconciliation.
"""

from __future__ import annotations

import pytest

from palegislature_spark.er import merge_names, name_struct, parse_vote_name
from pyspark.sql import functions as F


def merge(spark, n1, n2, require_suffix=True):
    """n1, n2: (first, middle, last, suffix) tuples -> merged dict or None."""
    df = spark.createDataFrame(
        [n1 + n2],
        "f1 string, m1 string, l1 string, s1 string, f2 string, m2 string, l2 string, s2 string",
    )
    out = df.select(
        merge_names(
            name_struct("f1", "m1", "l1", "s1"),
            name_struct("f2", "m2", "l2", "s2"),
            require_suffix,
        ).alias("m")
    ).collect()[0]["m"]
    return None if out is None else out.asDict()


def test_exact_match(spark):
    got = merge(spark, ("John", None, "Smith", None), ("John", None, "Smith", None))
    assert got == {"first": "John", "middle": None, "last": "Smith", "suffix": None}


def test_different_last_no_match(spark):
    assert merge(spark, ("John", None, "Smith", None), ("John", None, "Jones", None)) is None


def test_title_case_reconciliation(spark):
    # non-title-cased variant is canonical (names.py:99-106)
    got = merge(spark, ("Brian", None, "Mcrae", None), ("Brian", None, "McRae", None))
    assert got["last"] == "McRae"
    got = merge(spark, ("Brian", None, "McRae", None), ("Brian", None, "Mcrae", None))
    assert got["last"] == "McRae"


def test_bare_surname_adopts_other(spark):
    got = merge(spark, (None, None, "Smith", None), ("John", "Q", "Smith", "Jr."))
    assert got == {"first": "John", "middle": "Q", "last": "Smith", "suffix": "Jr."}


def test_nickname_resolves_to_formal(spark):
    for nick, formal in [("Tom", "Thomas"), ("Mike", "Michael"), ("Bernie", "Bernard"),
                         ("Tommy", "Thomas"), ("Stan", "Stanley")]:
        got = merge(spark, (nick, None, "Smith", None), (formal, None, "Smith", None))
        assert got and got["first"] == formal, (nick, formal)
        got = merge(spark, (formal, None, "Smith", None), (nick, None, "Smith", None))
        assert got and got["first"] == formal, (formal, nick)


def test_unrelated_firsts_no_match(spark):
    assert merge(spark, ("John", None, "Smith", None), ("Paul", None, "Smith", None)) is None


def test_initial_resolution(spark):
    for short in ("J.", "J"):
        got = merge(spark, (short, None, "Smith", None), ("John", None, "Smith", None))
        assert got and got["first"] == "John", short
    # different initial letter: no match
    assert merge(spark, ("K.", None, "Smith", None), ("John", None, "Smith", None)) is None


def test_fscott_swap(spark):
    # first='F.' middle='Scott' vs first='Scott' no middle (names.py:87-93)
    got = merge(spark, ("F.", "Scott", "Fitzgerald", None), ("Scott", None, "Fitzgerald", None))
    assert got == {"first": "F.", "middle": "Scott", "last": "Fitzgerald", "suffix": None}
    got = merge(spark, ("Scott", None, "Fitzgerald", None), ("F.", "Scott", "Fitzgerald", None))
    assert got["first"] == "F." and got["middle"] == "Scott"


def test_middle_reconciliation(spark):
    got = merge(spark, ("John", "Q", "Smith", None), ("John", None, "Smith", None))
    assert got["middle"] == "Q"
    got = merge(spark, ("John", "Q.", "Smith", None), ("John", "Quincy", "Smith", None))
    assert got["middle"] == "Quincy"
    # conflicting middles: no match (reference warns + returns None)
    assert merge(spark, ("John", "Quincy", "Smith", None), ("John", "Quill", "Smith", None)) is None
    assert merge(spark, ("John", "Amos", "Smith", None), ("John", "Quincy", "Smith", None)) is None


def test_suffix_rules(spark):
    # equal suffixes ok
    got = merge(spark, ("John", None, "Smith", "Jr."), ("John", None, "Smith", "Jr."))
    assert got["suffix"] == "Jr."
    # one-sided suffix fails when required...
    assert merge(spark, ("John", None, "Smith", "Jr."), ("John", None, "Smith", None)) is None
    # ...passes when not required (names.py:140-147)
    got = merge(spark, ("John", None, "Smith", "Jr."), ("John", None, "Smith", None), False)
    assert got["suffix"] == "Jr."
    # conflicting suffixes never match
    assert (
        merge(spark, ("John", None, "Smith", "Jr."), ("John", None, "Smith", "III"), False)
        is None
    )


@pytest.mark.parametrize(
    "raw,want",
    [
        ("SMITH", (None, None, "Smith", None)),
        ("WHITE, MARY JO", ("Mary", "Jo", "White", None)),
        ("KELLER, M. K.", ("M", "K.", "Keller", None)),  # M. -> M (match_names.py:36-37)
        ("MCILVAINE SMITH", ("Mcilvaine", None, "Smith", None)),
    ],
)
def test_parse_vote_name(spark, raw, want):
    got = spark.range(1).select(parse_vote_name(F.lit(raw)).alias("n")).collect()[0]["n"]
    assert (got["first"], got["middle"], got["last"], got["suffix"]) == want
