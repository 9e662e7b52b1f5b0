"""Corpus curation — the composed training-data pipeline.

Chains the extension operators the way a 100 TB pre-training corpus
job actually runs them: quality gate (length / stopword / diversity
signals, queries/text.py semantics) -> exact dedup (content-hash
window) -> near-dup prune (MinHash-LSH + exact verify,
operators/dedup.py).  Violations-as-data convention throughout
(er/validate.py style): nothing is silently dropped — every input
document comes back with a ``status`` recording why it survived or
not, so downstream consumers can audit the funnel.

Plan shape at scale: the signal computation is one linear codegen
pass; exact dedup shuffles once on the text hash; the near-dup stage
runs ONLY on gated survivors (the expensive stage sees the smallest
possible input — ordering the funnel cheap-to-expensive is the point
of composing it here rather than leaving call order to users).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from palegislature_spark.operators import dedup

STOPWORDS = ("the", "a", "of", "and")


def quality_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text, n_words, stop_ratio, distinct_ratio) — the
    queries/text.py signal set, exact int/int divisions only."""
    tk = F.split(F.col(text_col), " ")
    stop = F.size(F.filter(tk, lambda w: w.isin(*STOPWORDS)))
    return docs.select(
        F.col(id_col),
        F.col(text_col),
        F.size(tk).cast("long").alias("n_words"),
        (stop / F.size(tk)).alias("stop_ratio"),
        (F.size(F.array_distinct(tk)) / F.size(tk)).alias("distinct_ratio"),
    )


def curate_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 12,
    max_stop_ratio: float = 0.21,
    min_distinct_ratio: float = 0.35,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Full curation funnel; one row per input document.

    Output: (id, status, n_words) with status in
    {'kept', 'low_quality', 'exact_dup', 'near_dup'}:

    * ``low_quality`` — fails the signal gate;
    * ``exact_dup``  — passes the gate but another gated doc with a
      smaller id has identical text;
    * ``near_dup``   — survives exact dedup but is the LARGER id of a
      >= ``jaccard_threshold`` word-3gram pair among survivors
      (greedy smaller-id-wins pruning: deterministic, keeps at least
      one document per duplicate cluster);
    * ``kept``       — the curated corpus.

    The near-dup stage uses MinHash-LSH + exact verify (the scale
    path); its output equals the exact Jaccard pair set, which is
    what the DuckDB oracle replays.
    """
    sig = quality_signals(docs, id_col, text_col)
    gated = sig.withColumn(
        "q_ok",
        # NULL text yields NULL signals, so the raw conjunction is
        # NULL — which every downstream when() branch treats as false,
        # silently landing the row in 'kept'. Coalesce to false so a
        # NULL-text document is gated as low_quality like any other
        # failing row.
        F.coalesce(
            (F.col("n_words") >= min_words)
            & (F.col("stop_ratio") <= max_stop_ratio)
            & (F.col("distinct_ratio") >= min_distinct_ratio),
            F.lit(False),
        ),
    )
    w = Window.partitionBy(text_col).orderBy(id_col)
    exdup = (
        gated.filter("q_ok")
        .withColumn("rn", F.row_number().over(w))
        .select(id_col, "rn")
    )
    survivors = gated.join(exdup, id_col).filter("rn = 1").select(id_col, text_col)
    nd_pairs = dedup.minhash_lsh_pairs(
        survivors, id_col, text_col, n=3, threshold=jaccard_threshold
    )
    nd_dropped = nd_pairs.select(F.col("id_2").alias(id_col)).distinct()

    return (
        gated.join(exdup, id_col, "left")
        .join(nd_dropped.withColumn("__nd", F.lit(True)), id_col, "left")
        .select(
            id_col,
            F.when(~F.col("q_ok"), "low_quality")
            .when(F.col("rn") > 1, "exact_dup")
            .when(F.col("__nd"), "near_dup")
            .otherwise("kept")
            .alias("status"),
            "n_words",
        )
    )


def compact_curated(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Batch back half of the streaming curation funnel.

    ``streaming.curate_stream`` emits quality-gated documents with
    exact duplicates suppressed only WITHIN the watermark (bounded
    state); corpus-wide work is deliberately left to this periodic
    compaction over the merged sink:

    * exact duplicates that straddled the watermark (same text, state
      already evicted when the straggler arrived);
    * near-duplicates (MinHash-LSH banding needs a corpus-wide
      candidate join no stream can run with bounded state).

    Smaller-id-wins on both stages — the same deterministic pruning
    as :func:`curate_documents`, so stream-then-compact lands on the
    identical kept set as running the pure-batch funnel over the full
    corpus (asserted end-to-end in tests/test_streaming.py).

    Returns the kept rows ``(id, text)``.
    """
    w = Window.partitionBy(text_col).orderBy(id_col)
    survivors = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(id_col, text_col)
    )
    nd_pairs = dedup.minhash_lsh_pairs(
        survivors, id_col, text_col, n=3, threshold=jaccard_threshold
    )
    nd_dropped = nd_pairs.select(F.col("id_2").alias(id_col)).distinct()
    return survivors.join(nd_dropped, id_col, "left_anti")
