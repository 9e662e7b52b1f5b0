"""Benchmark decontamination and duplicate-span coverage.

Two span-level corpus hygiene operators every LLM training-data
pipeline runs before the tokenizer sees a byte:

- :func:`decontaminate` — flag training documents sharing word
  n-grams with a held-out evaluation set (the GPT-3 appendix-C /
  PaLM / Llama decontamination rule: any overlap of a long-enough
  n-gram marks the training document as contaminated).
- :func:`duplicate_span_coverage` — per-document fraction of tokens
  covered by spans of >= k tokens that also occur in at least one
  OTHER document (the span-level view of Lee et al. 2022,
  "Deduplicating Training Data Makes Language Models Better" — their
  suffix-array substring dedup, re-expressed as shingle-hash grouping
  plus interval union, both linear and shuffle-friendly).

Scale shape (the 100 TB story):

- Decontamination: the eval side is a BENCHMARK — fixed size
  (thousands of documents) no matter how big the training corpus is.
  Its distinct n-gram set is therefore dimension-sized and broadcast;
  the corpus-side pass is one linear projection + a broadcast-hash
  semi-join per n-gram, no corpus shuffle at all. Per-doc counts
  aggregate on the doc id (one shuffle of (id, hit) pairs only).
- Span coverage: span-hash occurrence counting is one shuffle with
  map-side combine on an 8-byte xxhash64 key; only spans that occur
  in >= 2 documents flow into the interval-union window (partitioned
  by doc — the same single-shuffle gaps-and-islands shape as
  ``operators/islands.py``). Nothing is ever collected.

Reference tie-in: the reference has no corpus hygiene (its corpus is
the PA vote record, `crawl.py` trusts the source); these extend the
Q2-family dedup semantics (`find_duplicates.py`) from whole-record to
sub-document spans, per the north-star extension charter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from palegislature_spark.functions.expr_util import let


def _word_ngrams(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, start, gram): every word n-gram with its 1-based start
    position. One split + one explode — linear, no shuffle."""
    toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("tk")
    )
    return toks.select(
        id_col,
        F.explode(
            F.when(
                F.size("tk") >= n,
                F.expr(
                    f"transform(sequence(1, size(tk) - {n - 1}),"
                    f" i -> struct(i AS start,"
                    f" array_join(slice(tk, i, {n}), ' ') AS gram))"
                ),
            ).otherwise(
                F.expr("array()").cast("array<struct<start:int,gram:string>>")
            )
        ).alias("g"),
    ).select(id_col, F.col("g.start").alias("start"), F.col("g.gram").alias("gram"))


def _spans(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, start, end, gram): every k-token span with its inclusive
    1-based token interval."""
    return _word_ngrams(docs, id_col, text_col, k).select(
        id_col,
        "start",
        (F.col("start") + F.lit(k - 1)).alias("end"),
        "gram",
    )


def _distinct_grams_col(n: int) -> Column:
    """Per-row distinct word-n-gram array over a ``tk`` token-array
    column. A document's n-grams are row-local, so this replaces a
    global (id, gram) DISTINCT shuffle with a map-side
    ``array_distinct`` — free at any corpus scale."""
    return F.when(
        F.size("tk") >= n,
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, size(tk) - {n - 1}),"
                f" i -> array_join(slice(tk, i, {n}), ' '))"
            )
        ),
    ).otherwise(F.expr("array()").cast("array<string>"))


def _gram_firsts_col(k: int) -> Column:
    """Per-row array<struct<gram,start>> holding each distinct
    k-gram's FIRST occurrence start (1-based). Sort the (gram, start)
    structs (field-lexicographic, so ties resolve to the smallest
    start) and keep each gram's first entry — all row-local, no
    shuffle. The sorted array is let-bound so the filter lambda's
    previous-element lookup doesn't copy the subtree."""
    structs = F.expr(
        f"array_sort(transform(sequence(1, size(tk) - {k - 1}),"
        f" i -> struct(array_join(slice(tk, i, {k}), ' ') AS gram,"
        f" i AS start)))"
    )
    dedup = let(
        structs,
        lambda arr: F.filter(
            arr,
            lambda x, i: (i == F.lit(0))
            | (F.element_at(arr, i)["gram"] != x["gram"]),
        ),
    )
    return F.when(F.size("tk") >= k, dedup).otherwise(
        F.expr("array()").cast("array<struct<gram:string,start:int>>")
    )


def _cross_doc_dup_grams(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Gram HASHES occurring in >= 2 distinct documents (one ``gh``
    column). ONE exchange total: per-doc dedup is row-local
    (:func:`_distinct_grams_col`), so every document contributes at
    most one row per gram to the map-side-combined groupBy count —
    the row count IS the distinct-document count.  The gram string is
    folded to a 64-bit xxhash64 map-side (guide §2.3: shuffle 8 bytes
    per gram instead of a k-token string; collisions at ~2^-64 per
    gram pair are quantitatively irrelevant, the hashed_shingles
    argument), so the exchange and the downstream join both carry
    longs."""
    return (
        docs.select(F.split(F.col(text_col), " ").alias("tk"))
        .select(F.explode(_distinct_grams_col(k)).alias("gram"))
        .select(F.xxhash64("gram").alias("gh"))
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gh")
    )


def _interval_islands(intervals: DataFrame, id_col: str) -> DataFrame:
    """Union overlapping [start, end] intervals per id — the classic
    running-max-end window — returning one row per merged island:
    (id, island, s, e, extent). Single shuffle on the id."""
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = Window.partitionBy(id_col).orderBy("start", "end")
    return (
        intervals.withColumn("prev_end", F.max("end").over(w_prev))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev_end").isNull()
                | (F.col("start") > F.col("prev_end")),
                1,
            ).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w_run))
        .groupBy(id_col, "island")
        .agg(
            F.min("start").alias("s"),
            F.max("end").alias("e"),
            (F.max("end") - F.min("start") + 1).alias("extent"),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    broadcast_eval: bool | None = None,
) -> DataFrame:
    """Per training document: n-gram overlap against the eval set.

    Returns (id, n_grams, n_hit, hit_share, contaminated) — one row
    per training document, zero-hit documents included.
    ``contaminated`` is the published rule: ANY shared n-gram flags
    the document. ``hit_share`` (distinct shared grams / distinct
    grams) stays int/int rational, so the value is engine-exact.

    The eval n-gram set broadcasts while it is benchmark-sized
    (fixed regardless of corpus scale); if the caller derives the
    eval side from the corpus itself, the auto policy switches to a
    shuffle join past ~5M distinct eval grams (``broadcast_eval``
    overrides).

    Scale shape (r7): a document's n-grams are ROW-LOCAL, so the
    per-doc distinct gram set is computed map-side with
    ``array_distinct`` — no global ``(id, gram)`` distinct shuffle —
    and the whole corpus side is ONE pass: ``n_grams`` rides along
    the gram explode, the eval membership test is a broadcast left
    join, and a single per-doc aggregation (map-side combined — a
    document's exploded grams are partition-local, so partials
    collapse to one row per doc before the exchange) produces both
    counts. The only shuffle on the broadcast path is that per-doc
    partial exchange. The >5M-gram shuffle-join fallback ships
    per-doc-deduped grams once. ``id_col`` must uniquely identify
    rows (true of every corpus table here); pre-aggregate
    duplicate-id inputs first.
    """
    grams_arr = _distinct_grams_col(n)
    # explode_outer keeps zero-gram (shorter than n words) documents
    # as a single NULL-gram row, so they are reported clean rather
    # than silently dropped
    # Both join sides carry the 64-bit gram hash instead of the gram
    # string (guide §2.3: the broadcast/exchange and the hash-table
    # probe move 8 bytes per gram; collisions at ~2^-64 per gram pair
    # are quantitatively irrelevant — the hashed_shingles argument).
    # explode_outer's NULL gram (doc shorter than n words) hashes to
    # the xxhash64 seed constant, which matches no eval gram, exactly
    # as NULL matched no string key.
    exploded = (
        train.select(F.col(id_col), F.split(F.col(text_col), " ").alias("tk"))
        .select(id_col, grams_arr.alias("grams"))
        .select(
            id_col,
            F.size("grams").cast("long").alias("n_grams"),
            F.explode_outer("grams").alias("gram"),
        )
        .select(
            id_col, "n_grams", F.xxhash64("gram").alias("gh")
        )
    )
    eval_grams = (
        _word_ngrams(eval_df, id_col, text_col, n)
        .select(F.xxhash64("gram").alias("gh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast_eval is None:
        # a true benchmark is fixed-size and always broadcasts, but a
        # caller deriving the eval side from the corpus (e.g. a 5%
        # split) grows it linearly — past ~5M distinct grams the
        # broadcast would blow the 8GB torrent limit long before
        # 100 TB, so fall back to a shuffle join (one count() action
        # to decide, same policy as the other auto-sized operators).
        # The sizing count() and the join consume the SAME distinct
        # gram set — checkpoint it once so the eval-side gram pass is
        # not paid twice (it is corpus-sized when the caller swaps the
        # roles, as benchmark_eval_overlap does).
        eval_grams = eval_grams.localCheckpoint(eager=False)
        broadcast_eval = eval_grams.count() <= 5_000_000
    eval_side = F.broadcast(eval_grams) if broadcast_eval else eval_grams
    return (
        exploded.join(eval_side, "gh", "left")
        .groupBy(id_col)
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.coalesce(F.sum("__hit"), F.lit(0))
            .cast("long")
            .alias("n_hit"),
        )
        .withColumn(
            "hit_share",
            F.when(
                F.col("n_grams") > 0, F.col("n_hit") / F.col("n_grams")
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("contaminated", F.col("n_hit") > 0)
    )


def duplicate_span_coverage(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Per document: fraction of tokens covered by k-token spans that
    occur in >= 2 distinct documents.

    Returns (id, n_tokens, covered_tokens, coverage) for EVERY
    document (zero-coverage rows included). All counts are integers;
    ``coverage`` is the single int/int division, so the result is
    engine-exact.

    Plan: span occurrences -> groupBy(gram) countDistinct(doc) (one
    shuffle, map-side combined) -> semi-join spans whose count >= 2
    back (shuffle on the gram key) -> per-doc interval union via the
    running-max-end window (one shuffle on the doc id) -> covered =
    sum of merged-island extents. No step is ever worse than linear
    in corpus tokens, and no state is driver-sized.

    ``id_col`` must uniquely identify rows: the cross-doc dup-gram
    count treats each row as one document (row count == distinct-doc
    count after the row-local gram dedup), so a duplicate-id input
    silently inflates the >= 2 threshold — pre-aggregate duplicate-id
    inputs first (same contract as :func:`decontaminate`).
    """
    toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("tk")
    )
    n_tokens = toks.select(
        id_col, F.size("tk").cast("long").alias("n_tokens")
    )
    spans = _spans(docs, id_col, text_col, k).select(
        id_col, "start", "end", F.xxhash64("gram").alias("gh")
    )
    dup_spans = spans.join(
        _cross_doc_dup_grams(docs, id_col, text_col, k), "gh", "left_semi"
    )
    covered = (
        _interval_islands(dup_spans, id_col)
        .groupBy(id_col)
        .agg(F.sum("extent").cast("long").alias("covered_tokens"))
    )
    return (
        n_tokens.join(covered, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("covered_tokens", F.lit(0))
            .cast("long")
            .alias("covered_tokens"),
        )
        .withColumn("coverage", F.col("covered_tokens") / F.col("n_tokens"))
    )


def strip_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Remove cross-document duplicated spans, keeping one canonical
    occurrence — the REWRITE step of Lee et al. 2022 substring dedup
    (their ExactSubstr: delete all but the first occurrence of every
    duplicated >= k-token span).

    The canonical occurrence of a duplicated k-gram is its globally
    first position (min (doc_id, start) — deterministic). Every
    NON-canonical occurrence's interval is unioned per document, and
    tokens inside that union are dropped; the surviving tokens are
    re-joined into ``text_clean`` in original order.

    Returns (id, n_tokens, n_removed, text_clean) for every document.

    Scale shape (r7 second-decade hardening — the r6 form carried a
    per-gram SORT window for canonical election plus a full
    position-explode + (id, pos) anti-join + collect_list rebuild,
    three corpus-token-volume shuffles): canonical election is now
    pure hash aggregation — per-(gram, doc) min start (map-side
    combined, docs are partition-local), then per-gram distinct-doc
    count and argmin-(doc, start) in ONE combined pass — joined back
    to the span table; no sort anywhere on the gram key.  The strip
    no longer touches per-token rows at all: merged removable islands
    aggregate to a per-doc interval ARRAY (island-sized shuffle), and
    the cleaned text is rebuilt from the packed token array by
    slicing the GAPS between islands (zip_with of gap starts/ends —
    O(tokens) JVM-side, no explode).  ``n_removed`` falls out of the
    disjoint-island extents.  The only full-token-volume stage left
    is the span explode feeding the gram aggregation — the operator's
    irreducible core.

    ``id_col`` must uniquely identify rows: the per-gram distinct-doc
    count counts one row per (gram, doc) after the row-local first-
    occurrence dedup, so a duplicate-id input silently inflates it —
    pre-aggregate duplicate-id inputs first (same contract as
    :func:`decontaminate`).
    """
    toks = docs.select(
        F.col(id_col),
        F.split(F.col(text_col), " ").alias("tk"),
    )

    spans = _spans(docs, id_col, text_col, k).select(
        id_col, "start", "end", F.xxhash64("gram").alias("gh")
    )
    # per-(gram, doc): first occurrence start — row-local (a doc's
    # grams live in its own row, :func:`_gram_firsts_col`), so the
    # canon aggregation below is the ONLY exchange on the gram key —
    # carried as the 64-bit gram hash (guide §2.3, the
    # _cross_doc_dup_grams argument), so the exchange and the join
    # back to the span table move longs, not k-token strings
    per_doc = toks.select(
        id_col, F.explode(_gram_firsts_col(k)).alias("g")
    ).select(
        id_col,
        F.xxhash64(F.col("g.gram")).alias("gh"),
        F.col("g.start").alias("fs"),
    )
    # per gram: distinct-doc count + global argmin (doc, start); the
    # struct min IS the lexicographic (doc_id, start) order the
    # canonical-election window used
    canon = (
        per_doc.groupBy("gh")
        .agg(
            F.count(F.lit(1)).alias("nd"),
            F.min(
                F.struct(F.col(id_col).alias("i"), F.col("fs").alias("s"))
            ).alias("c"),
        )
        .filter(F.col("nd") >= 2)
        .select(
            "gh",
            F.col("c.i").alias("__canon_id"),
            F.col("c.s").alias("__canon_start"),
        )
    )
    removable = (
        spans.join(canon, "gh")
        .filter(
            ~(
                (F.col(id_col) == F.col("__canon_id"))
                & (F.col("start") == F.col("__canon_start"))
            )
        )
        .select(id_col, "start", "end")
    )
    # per-doc interval union of removable spans, packed to one array
    # row per affected doc (islands are disjoint and extent-summable)
    islands = _interval_islands(removable, id_col)
    isl_arr = islands.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("s"), F.col("e")))
        ).alias("rem"),
        F.sum("extent").cast("long").alias("n_removed"),
    )
    # gap-slice rebuild: kept token ranges are [1, s1-1], [e1+1, s2-1],
    # ..., [ek+1, n] — slice each gap out of the packed array and join
    clean = F.expr(
        "array_join(flatten(zip_with("
        " concat(array(1), transform(rem, r -> r.e + 1)),"
        " concat(transform(rem, r -> r.s - 1), array(size(tk))),"
        " (a, b) -> if(b >= a, slice(tk, a, b - a + 1),"
        "               CAST(array() AS array<string>))"
        ")), ' ')"
    )
    return (
        toks.join(isl_arr, id_col, "left")
        .withColumn("rem", F.coalesce("rem", F.expr("array()")))
        .select(
            id_col,
            F.size("tk").cast("long").alias("n_tokens"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
            clean.alias("text_clean"),
        )
    )
