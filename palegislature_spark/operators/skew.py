"""Skew handling: salted joins and two-phase aggregation (SURVEY §4.3.2,
M5 scale hardening).

AQE's skew-join splitting (enabled in session defaults) handles most
runtime skew; these explicit operators cover the cases AQE cannot:
aggregations over heavy-hitter keys (AQE never splits a hash
aggregate) and joins where one key dominates so hard that even split
partitions bottleneck a single key's build side.

Salting is deterministic here — the salt derives from a hash of
payload columns, not rand() — so plans stay replayable and retries
produce identical partitioning (rand() in a shuffle key breaks
determinism under task retry).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: Sequence[str], buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from a row's column values."""
    return F.pmod(F.xxhash64(*cols), F.lit(buckets)).cast("int")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: Sequence[str],
    salt_cols: Sequence[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are split across buckets.

    The skewed side salts on a hash of ``salt_cols`` (payload columns
    that distribute within a hot key); the other side replicates each
    row across all buckets (explode of a salt sequence) so every
    (key, salt) partition still finds its match. Shuffle volume for
    the other side multiplies by ``buckets`` — use for dimension-
    sized or pre-filtered right sides.

    Only join types where replicated-but-unmatched ``other`` rows
    never reach the output are allowed: with right/full-outer, each
    unmatched ``other`` row would surface once per salt bucket
    (``buckets``-way duplication, ADVICE r1).
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched replicated "
            f"rows; supported: {sorted(allowed)}"
        )
    keys = list(keys)
    s = skewed.withColumn("__salt", _salt(list(salt_cols), buckets))
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<int>"))
    )
    return s.join(o, [*keys, "__salt"], how).drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    salt_cols: Sequence[str],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation for heavy-hitter group keys.

    Phase 1 aggregates on (keys, salt) — the hot key's rows spread
    over ``buckets`` partitions; phase 2 combines partials on keys.
    ``aggs`` maps column -> one of sum/count/min/max (the algebraic
    aggregates with trivial partial+final composition; count partials
    combine with sum).
    """
    keys = list(keys)
    partial_exprs, final_exprs = [], []
    for col, fn in aggs.items():
        alias = f"{fn}_{col}"
        if fn == "count":
            partial_exprs.append(F.count(col).alias(alias))
            final_exprs.append(F.sum(alias).alias(alias))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, fn)(col).alias(alias))
            final_exprs.append(getattr(F, fn)(alias).alias(alias))
        else:  # pragma: no cover
            raise ValueError(f"unsupported agg {fn!r}; use sum/count/min/max")
    salted = df.withColumn("__salt", _salt(list(salt_cols), buckets))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
