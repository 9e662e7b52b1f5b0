"""Sequence packing — concat-and-chunk documents into fixed token
budgets, the layout step between a curated corpus and a training run.

The standard pretraining input pipeline concatenates documents in a
deterministic order and slices the token stream into fixed-size
training sequences (documents may span chunk boundaries). The core
computation is an exclusive prefix sum of token counts in document
order — which a naive ``Window.orderBy(...)`` makes a SINGLE-PARTITION
sort (the global-window scale bug vocab_topk once had). This
implementation is the classic two-phase distributed prefix sum:

1. order-preserving range buckets over the sort key;
2. per-bucket token totals — a bucket-count-sized aggregate —
   cumulated into per-bucket base offsets (broadcast back);
3. within-bucket running sums under a PARTITIONED window.

Every stage is parallel; the only global object is the bucket-offsets
table (thousands of rows at any corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    bucket_size: int = 100_000,
) -> DataFrame:
    """Assign each document its place in the packed token stream.

    Documents are ordered by ``id_col`` — which must be NUMERIC (the
    range buckets divide it; hash non-numeric ids to a dense long
    first) — deterministically, so packing is resumable;
    ``tokens_col`` supplies per-document token counts (defaults to
    whitespace token count of ``text_col``). Returns
    ``(id, n_tokens, start_offset, first_chunk, last_chunk)`` where
    chunk ``i`` covers token offsets ``[i*budget, (i+1)*budget)`` —
    ``first_chunk``/``last_chunk`` are the training sequences the
    document lands in (spanning allowed, empty docs claim no chunk).
    """
    if tokens_col is None:
        n = F.size(F.filter(F.split(text_col, " "), lambda w: w != ""))
    else:
        n = F.col(tokens_col)
    base = docs.select(
        F.col(id_col), n.cast("long").alias("n_tokens")
    ).withColumn("__bkt", F.floor(F.col(id_col) / F.lit(bucket_size)))

    # bucket-count-sized: totals per range bucket, cumulated into the
    # base offset each bucket starts at. The window here runs over the
    # BUCKET table (thousands of rows), not the data.
    totals = base.groupBy("__bkt").agg(F.sum("n_tokens").alias("__t"))
    offsets = totals.select(
        "__bkt",
        (F.sum("__t").over(Window.orderBy("__bkt")) - F.col("__t")).alias(
            "__base"
        ),
    )

    win = (
        Window.partitionBy("__bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        base.join(F.broadcast(offsets), "__bkt")
        .withColumn(
            "start_offset",
            (F.col("__base") + F.sum("n_tokens").over(win) - F.col("n_tokens")),
        )
        .drop("__bkt", "__base")
    )
    # integer DIV, not floor(double division): offsets at 100 TB pass
    # 2^53 tokens, where double arithmetic silently loses exactness
    return packed.select(
        id_col,
        "n_tokens",
        "start_offset",
        F.when(
            F.col("n_tokens") > 0, F.expr(f"start_offset DIV {budget}")
        ).alias("first_chunk"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr(f"(start_offset + n_tokens - 1) DIV {budget}"),
        ).alias("last_chunk"),
    )


def chunk_membership(
    packed: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Explode packing output to (chunk_id, id) — which documents feed
    each training sequence (attribution / opt-out lookups)."""
    return packed.filter(F.col("first_chunk").isNotNull()).select(
        F.explode(
            F.sequence(F.col("first_chunk"), F.col("last_chunk"))
        ).alias("chunk_id"),
        F.col(id_col),
    )
