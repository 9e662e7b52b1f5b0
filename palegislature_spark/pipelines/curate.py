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


def mixture_repeat_factors(
    docs: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-source temperature-mixture repeat factors (alpha = 0.5)
    over an ARBITRARY corpus frame — the generic form of the
    registered ``corpus_mixture_weights`` algebra (queries/corpus.py
    ``domain_mixture_weights``, kept separate so the oracle-green
    query's plan never moves), usable mid-pipeline on a curated
    survivor set. Alpha stays the published sqrt rule: ``sqrt`` is
    correctly rounded on every engine where a general ``pow`` is not,
    which is what keeps the factors engine-exact. The sqrt-weight
    normalizer is the same order-pinned sequential fold. Returns
    ``(source, repeat_factor)`` — dimension-sized."""
    src = docs.groupBy(source_col).agg(
        F.sum(F.size(F.split(text_col, " "))).cast("long").alias("__nt")
    )
    w = src.withColumn("__sw", F.sqrt(F.col("__nt").cast("double")))
    scal = w.agg(
        F.sum("__nt").cast("long").alias("__grand"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(source_col, "__sw"))),
                lambda s: s["__sw"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("__denom"),
    )
    return w.crossJoin(F.broadcast(scal)).select(
        source_col,
        (
            (F.col("__sw") / F.col("__denom"))
            / (F.col("__nt") * F.lit(1.0) / F.col("__grand"))
        ).alias("repeat_factor"),
    )


def curation_epoch_plan(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    jaccard_threshold: float = 0.8,
    decontam_n: int = 5,
    budget: int = 512,
    seed: str = "epoch0",
) -> DataFrame:
    """The WHOLE curation pipeline as ONE composed plan (VERDICT r9
    #8): quality gate -> exact dedup -> near-dup prune -> benchmark
    decontamination -> temperature-mixture epoch draw -> deterministic
    global shuffle -> token packing. Every stage is the
    individually-oracle-green component, chained; what this function
    adds is the END-TO-END artifact — the job a pre-training corpus
    refresh actually submits, with one action materializing the final
    packed epoch.

    Output, one row per epoch COPY of each surviving document:
    ``(id, copy_idx, source, position, n_tokens, start_offset,
    first_chunk, last_chunk)`` — ``position`` is the 1-based global
    training order, chunk bounds are the training sequences the copy
    lands in.

    Stage order is cheap-to-expensive-to-smallest (the
    curate_documents principle extended): the gate and exact dedup
    shrink the corpus before the banded near-dup join; decontam's
    corpus pass runs only on dedup survivors; the mixture table and
    the epoch draw are dimension-sized/row-local; the shuffle-order
    and packing stages see only the drawn copies. No stage ever holds
    more than (corpus-linear rows keyed by bucket) — there is no
    single-partition sort anywhere (epoch_order's 256-bucket prefix
    sums; packing's range-bucket offsets).

    Scale invariants pinned in tests/test_pipelines.py: positions are
    an exact 1..N permutation; token offsets tile the stream gaplessly
    in position order; per-source drawn token mass tracks the
    temperature share; contaminated/low-quality/dup documents never
    reach the epoch.
    """
    from palegislature_spark.operators.contamination import decontaminate
    from palegislature_spark.operators.packing import pack_sequences
    from palegislature_spark.operators.sampling import epoch_order

    # 1-2-3: gate + exact dedup + near-dup prune (status table), then
    # keep survivors' text for the downstream stages.
    # Reuse discipline (the minhash_lsh_pairs lesson): every multi-
    # consumer subtree is lazily checkpointed ONCE — `survivors` feeds
    # decontam AND the clean semi-join, `clean` feeds the mixture table
    # AND the draw — otherwise the banded near-dup gate (the expensive
    # stage) re-executes per consumer (measured 26s -> the checkpointed
    # form at sf0.1; each checkpoint is survivor-row-sized).
    status = curate_documents(
        docs, id_col, text_col, jaccard_threshold=jaccard_threshold
    )
    kept = status.filter(F.col("status") == "kept").select(id_col)
    survivors = (
        docs.select(id_col, text_col, source_col)
        .join(kept, id_col, "left_semi")
        .localCheckpoint(eager=False)
    )
    # 4: decontamination against the eval set (any shared n-gram drops)
    dec = decontaminate(survivors, eval_df, id_col, text_col, n=decontam_n)
    clean = survivors.join(
        dec.filter(~F.col("contaminated")).select(id_col), id_col, "left_semi"
    ).localCheckpoint(eager=False)
    # 5: mixture repeat factors over the CLEAN corpus + the epoch draw
    # (corpus_epoch_sample's deterministic md5 fraction rule)
    rf = mixture_repeat_factors(clean, source_col, text_col)
    eff = clean.join(F.broadcast(rf), source_col).select(
        id_col, text_col, source_col, F.col("repeat_factor").alias("__eff")
    )
    boundary = F.floor(
        (F.col("__eff") - F.floor("__eff")) * F.lit(1152921504606846976.0)
    ).cast("long")
    draw = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + "|"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    n_copies = (
        F.floor("__eff").cast("long") + F.when(draw < boundary, 1).otherwise(0)
    )
    copies = eff.select(
        id_col,
        source_col,
        F.size(F.filter(F.split(text_col, " "), lambda t: t != ""))
        .cast("long")
        .alias("n_tokens"),
        F.explode(
            F.when(n_copies >= 1, F.sequence(F.lit(1), n_copies)).otherwise(
                F.expr("array()").cast("array<int>")
            )
        ).alias("copy_idx"),
    )
    # 6: deterministic global training order over the copies (composite
    # copy key so every copy draws its own shuffle position); the copy
    # table feeds both the order computation and the join back
    keyed = copies.withColumn(
        "__ck",
        F.concat(F.col(id_col).cast("string"), F.lit("#"), F.col("copy_idx")),
    ).localCheckpoint(eager=False)
    order = epoch_order(keyed.select("__ck"), "__ck", seed)
    ordered = keyed.join(order, "__ck")
    # 7: pack the ordered stream into fixed token budgets — position is
    # the numeric id pack_sequences ranges over, so the packed stream
    # IS the training order
    packed = pack_sequences(
        ordered.select("position", "n_tokens"),
        budget=budget,
        id_col="position",
        tokens_col="n_tokens",
    )
    return (
        ordered.select(id_col, "copy_idx", source_col, "position")
        .join(packed, "position")
        .select(
            id_col,
            F.col("copy_idx").cast("long").alias("copy_idx"),
            source_col,
            "position",
            "n_tokens",
            "start_offset",
            "first_chunk",
            "last_chunk",
        )
    )
