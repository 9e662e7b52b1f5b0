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
    rows = [
        tokens.select(
            F.lit(r).alias("row"),
            _bucket(F.col(token_col), r),
            w.alias("__w"),
        )
        for r in range(DEPTH)
    ]
    un = rows[0]
    for other in rows[1:]:
        un = un.unionByName(other)
    return un.groupBy("row", "bucket").agg(F.sum("__w").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, items: DataFrame, token_col: str = "token"
) -> DataFrame:
    """Estimate each item's frequency: min over rows of its counter.

    The sketch is sketch-sized — broadcast; per item this is DEPTH
    lookups and a min, no shuffle on the data side.
    """
    probes = None
    for r in range(DEPTH):
        p = items.select(
            F.col(token_col), F.lit(r).alias("row"), _bucket(F.col(token_col), r)
        )
        probes = p if probes is None else probes.unionByName(p)
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"])
    return joined.groupBy(token_col).agg(F.min("cnt").alias("est"))
