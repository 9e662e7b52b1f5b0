"""Count-min sketch — bounded-memory frequency estimation.

The sketch (Cormode & Muthukrishnan 2005) replaces an unbounded
token→count map with ``depth`` rows of ``width`` counters: each item
increments one counter per row (chosen by a per-row hash), and its
estimate is the MIN of those counters — always an OVERestimate, within
``2N/width`` of truth with probability ``1 - (1/2)^depth``.

Where it earns its keep at 100 TB: the sketch table is
``depth × width`` rows NO MATTER the corpus — a mergeable, fixed-size
aggregate (sum sketches of partitions/batches to sketch their union),
which is what a streaming heavy-hitter stage or a pre-aggregation
pushdown needs when the true groupBy state (1e9 distinct tokens) can't
be held. Construction here is one explode + one ``groupBy(row,
bucket)`` — map-side combined, shuffle bounded by the sketch size.

The bucket hash is md5-based (last three hex nibbles mod width) so the
DuckDB oracle replays the EXACT same sketch — same buckets, same
counters, same estimates; xxhash64 would be faster but has no DuckDB
twin (same trade recorded in dedup.minhash_signatures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 1024


def _bucket(token_col, row: int) -> F.Column:
    """md5(row || '|' || token) last-3-nibbles mod WIDTH — exactly
    replayable nibble arithmetic (conv() is exact for 3 hex digits)."""
    h = F.md5(F.concat(F.lit(f"{row}|"), token_col))
    return (F.conv(F.substring(h, 30, 3), 16, 10).cast("long") % WIDTH).alias(
        "bucket"
    )


def cms_sketch(
    tokens: DataFrame, token_col: str = "token", weight_col: str | None = None
) -> DataFrame:
    """Build the sketch: (row, bucket, cnt), at most DEPTH*WIDTH rows.

    ``weight_col`` aggregates pre-counted input (token, weight) instead
    of raw occurrences. Sketches are mergeable: union two sketch tables
    and re-sum (row, bucket) to sketch the combined corpus.
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    # One pass: each input row emits its DEPTH (row, bucket) pairs via
    # a single explode.  The r11 form unioned DEPTH projections of the
    # input frame, which re-instantiated the input's whole lineage per
    # sketch row (cms_heavy_hitters paid its corpus explode+aggregate
    # DEPTH times — guide §2.4, remove duplicate passes); the (row,
    # bucket, weight) multiset, and therefore the sketch, is identical.
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), _bucket(F.col(token_col), r)
            )
            for r in range(DEPTH)
        ]
    )
    return (
        tokens.select(F.explode(pairs).alias("rb"), w.alias("__w"))
        .select(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"), "__w")
        .groupBy("row", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, items: DataFrame, token_col: str = "token"
) -> DataFrame:
    """Estimate each item's frequency: min over rows of its counter.

    The sketch is sketch-sized — broadcast; per item this is DEPTH
    lookups and a min, no shuffle on the data side.
    """
    # same one-pass explode as cms_sketch: the r11 DEPTH-way union
    # re-instantiated the items frame's lineage per sketch row
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), _bucket(F.col(token_col), r)
            )
            for r in range(DEPTH)
        ]
    )
    probes = items.select(F.col(token_col), F.explode(pairs).alias("rb")).select(
        token_col,
        F.col("rb.row").alias("row"),
        F.col("rb.bucket").alias("bucket"),
    )
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"])
    return joined.groupBy(token_col).agg(F.min("cnt").alias("est"))


# --------------------------------------------------------------------------
# Bloom filter (join-pruning set membership, same md5-replay discipline)
# --------------------------------------------------------------------------

BLOOM_BITS = 4096  # 3 md5 nibbles address [0, 4096) exactly
BLOOM_K = 3
_WORD_BITS = 60  # bits 0..59 only: DuckDB errors on BIGINT << 63


def _bit_pos(value_col, probe: int) -> F.Column:
    h = F.md5(F.concat(F.lit(f"b{probe}|"), value_col.cast("string")))
    return F.conv(F.substring(h, 30, 3), 16, 10).cast("long")


def bloom_build(df: DataFrame, value_col: str) -> DataFrame:
    """(word, bits) bitmap rows — ~BLOOM_BITS/60 rows regardless of
    input size. Mergeable: union two filters and re-bit_or by word to
    get the filter of the combined key set. The classic use at scale:
    build on a join key's build side, broadcast, and prune the probe
    side BEFORE the shuffle (what Spark's runtime bloom pushdown does
    internally — here it is an explicit, persistable operator)."""
    # one pass over the build side (the r11 BLOOM_K-way union re-read
    # the build side's lineage per probe — same fix as cms_sketch)
    probes = df.select(
        F.explode(
            F.array(
                *[_bit_pos(F.col(value_col), p) for p in range(BLOOM_K)]
            )
        ).alias("pos")
    )
    # shiftleft's bit count must be a column here, which the Python
    # helper only takes as an int literal — drop to the SQL form
    return (
        probes.select(
            F.expr(f"pos DIV {_WORD_BITS}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT))"
            ).alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )


def bloom_might_contain(
    bloom: DataFrame, items: DataFrame, value_col: str
) -> DataFrame:
    """items + a ``might_contain`` flag: false is DEFINITE absence (no
    false negatives — the property that makes pre-shuffle pruning
    safe); true may be a false positive at the filter's design rate.
    The bitmap is sketch-sized and broadcasts; probing is a linear
    pass."""
    # one pass over the probe side (same union→explode fix as above)
    probes = items.select(
        F.col(value_col),
        F.explode(
            F.array(
                *[_bit_pos(F.col(value_col), p) for p in range(BLOOM_K)]
            )
        ).alias("pos"),
    ).select(
        F.col(value_col),
        F.expr(f"pos DIV {_WORD_BITS}").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT))"
        ).alias("m"),
    )
    hit = (
        probes.join(F.broadcast(bloom), "word", "left")
        .select(
            value_col,
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("m"))
                != 0
            ).alias("h"),
        )
        .groupBy(value_col)
        .agg(F.min("h").alias("might_contain"))
    )
    return hit
