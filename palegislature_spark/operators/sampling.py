"""Deterministic sampling and dataset splitting for training pipelines.

Train/validation/test splits and per-stratum downsampling must be (a)
reproducible across runs and engines, (b) stable under repartitioning,
and (c) assignable in a single linear pass — which rules out
``df.randomSplit`` (seed- and partitioning-dependent) and
``df.sample`` (ditto). The standard production answer is hash-based
assignment: a keyed cryptographic hash maps each row to a uniform
point in [0, 1), and split boundaries carve that interval.

Engine-exactness trick: instead of parsing the hash to a float (whose
rounding would have to match across engines), the uniform draw STAYS a
hex string — ``md5(salt || id)``'s 15-hex-digit prefix — and split
boundaries are precomputed 15-digit hex literals compared
lexicographically (lowercase hex orders identically to its numeric
value). The DuckDB oracle replays the identical comparison, so the
assignment is exact-checkable with no float anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HEX_DIGITS = 15  # 60 bits of the md5 — plenty below float precision loss


def _hex_boundary(p: float) -> str:
    """15-hex-digit lexicographic boundary for cumulative weight p."""
    return format(int(p * (16**_HEX_DIGITS)), "015x")


def cumulative_hex_boundaries(weights: dict[str, float]) -> list[tuple[str, str]]:
    """The exact (name, upper-boundary) pairs ``split_column`` compares
    against, derived with the SAME float accumulation order it uses.

    Oracles replaying a split MUST take boundaries from here, never
    re-derive them from a cumulative literal: ``0.9 + 0.05`` rounds to
    0.9500000000000001 whose hex boundary (...380) differs from
    ``_hex_boundary(0.95)`` (...300) by a 0x80/2^60 window — wide
    enough for a doc's md5 draw to land in it and flip splits between
    engines (ADVICE r5)."""
    cum = 0.0
    out: list[tuple[str, str]] = []
    for name in list(weights)[:-1]:
        cum += weights[name]
        out.append((name, _hex_boundary(cum)))
    return out


def _draw(id_col: str, salt: str) -> F.Column:
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
        1,
        _HEX_DIGITS,
    )


def split_column(
    id_col: str, weights: dict[str, float], salt: str = "split"
) -> F.Column:
    """Column assigning each row to a named split by hash interval.

    ``weights`` maps split name -> fraction (must sum to ~1; the last
    split absorbs rounding). Deterministic in (salt, id) only —
    repartition-, run- and engine-stable.
    """
    names = list(weights)
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights sum to {total}, expected 1")
    cum = 0.0
    expr = None
    draw = _draw(id_col, salt)
    for name in names[:-1]:
        cum += weights[name]
        cond = draw < F.lit(_hex_boundary(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    ).alias("split")


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Attach a deterministic ``split`` column (see split_column)."""
    return df.withColumn("split", split_column(id_col, weights, salt))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict,
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its hash
    draw falls below its stratum's fraction boundary. The per-stratum
    keep rate converges to ``fractions[stratum]`` (exact in
    expectation, hash-uniform), rows kept are identical across runs,
    engines and partitionings — the property rebalancing a training
    corpus by language/source requires (df.sample can't give it).

    One linear codegen pass; no shuffle.
    """
    draw = _draw(id_col, salt)

    def keep(frac: float) -> F.Column:
        # frac >= 1 would need a 16-digit boundary that no 15-digit
        # draw compares below lexicographically — clamp to keep-all
        # (and frac <= 0 to drop-all) instead of comparing
        if frac >= 1.0:
            return F.lit(True)
        if frac <= 0.0:
            return F.lit(False)
        return draw < F.lit(_hex_boundary(frac))

    expr = None
    for stratum, frac in sorted(fractions.items()):
        cond = (F.col(strata_col) == F.lit(stratum)) & keep(frac)
        expr = cond if expr is None else expr | cond
    if default_fraction > 0:
        others = ~F.col(strata_col).isin(*[s for s in fractions])
        cond = others & keep(default_fraction)
        expr = cond if expr is None else expr | cond
    return df.filter(expr if expr is not None else F.lit(False))


def sample_k_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    k: int,
    salt: str = "groupk",
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen by hash order —
    the deterministic 'k examples per language/source' pick an eval-set
    builder needs (same rows every run, engine and partitioning
    independent, no RNG state).

    One shuffle on the group column; rows rank by the md5 draw with the
    id as tiebreak, so the selection is a uniform-without-replacement
    sample per group under the usual hash-uniformity assumption.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(_draw(id_col, salt), id_col)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def epoch_order(
    df: DataFrame,
    id_col: str,
    seed: str,
    n_buckets_hex_chars: int = 2,
) -> DataFrame:
    """Deterministic global training-order permutation (the "shuffle
    each epoch" a data loader needs), with exact 1-based global
    positions computed WITHOUT a single-partition sort.

    Every row draws a reshuffle key ``md5(seed || id)``; the global
    rank in key order is assembled as range-bucket prefix sums (the
    packing.py two-phase pattern):

    1. bucket = first ``n_buckets_hex_chars`` hex chars of the key
       (256 buckets at the default — uniform by construction, raise
       to 3-4 chars past ~1e10 rows so per-bucket sorts stay in
       memory);
    2. within-bucket rank: ``row_number`` over a window PARTITIONED by
       bucket (distributed sort, never one partition);
    3. bucket offsets: one map-side-combined count per bucket, prefix
       sum over the 256-row bucket table (the only unpartitioned
       window, bounded by construction), broadcast back.

    position = offset(bucket) + within. Ordering ties on the full key
    break by ``id_col``, so the permutation is total and reproducible
    on any engine.
    """
    k = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    keyed = df.select(F.col(id_col), k.alias("shuffle_key")).withColumn(
        "bucket", F.substring("shuffle_key", 1, n_buckets_hex_chars)
    )
    within = F.row_number().over(
        Window.partitionBy("bucket").orderBy("shuffle_key", id_col)
    )
    ranked = keyed.withColumn("within", within)
    offsets = (
        keyed.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("long"),
        )
        .drop("n")
    )
    return ranked.join(F.broadcast(offsets), "bucket").select(
        F.col(id_col),
        "shuffle_key",
        (F.col("offset") + F.col("within")).cast("long").alias("position"),
    )
