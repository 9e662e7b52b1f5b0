"""Rank fusion for multi-retriever serving (hybrid search).

Reference scope: the reference engine serves single-signal lookups
(see SURVEY §2 S5/A6 — point lookup, ORDER+LIMIT top-k); a modern
retrieval stack fuses a lexical leg (BM25, operators/index.py) with a
vector leg (IVF/brute cosine, operators/similarity.py).  Reciprocal
rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) is the standard
score-free combiner: each leg contributes 1/(k0 + rank), so legs with
incomparable score scales fuse without calibration.

Scale: every input here is a SERVED SHORTLIST (top-k per retriever,
k ~ tens) — the expensive part already happened inside the leg
(posting-bounded BM25 scan, list-pruned IVF probe).  Fusion itself is
a fold of outer joins over k-row frames: broadcast-sized by
construction, never corpus-sized.  The single-partition window inside
:func:`rank_from_scores` ranks a k-row frame, not the corpus (same
bounded-frame argument as the 1-row scalar attaches on the plan-audit
allowlist).

IEEE exactness: 1.0/(k0 + rank) is one correctly-rounded double
division; contributions are added in LEG-DECLARATION order with a
0.0 identity for missing legs (0.0 + x == x), so the fused score is
bit-reproducible in any engine that evaluates the same expression —
which is what lets the DuckDB oracle replay it exactly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Cormack et al.'s k0: dampens the head so one retriever's rank-1
# cannot dominate two retrievers' rank-2/rank-3 agreement.
RRF_K0 = 60


def rank_from_scores(
    shortlist: DataFrame,
    id_col: str,
    score_col: str,
    k: int,
) -> DataFrame:
    """(id, rank) from a served shortlist, rank 1 = best score.

    Ties break on ascending id — the same deterministic order the
    legs' own ORDER BY ... LIMIT used, so ranking the shortlist again
    cannot disagree with the cut that produced it.  The window is
    single-partition ON PURPOSE: the input is k rows.
    """
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
    return (
        shortlist.select(id_col, score_col)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank")
    )


def rrf_fuse(
    legs: Sequence[tuple[str, DataFrame]],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k0: int = RRF_K0,
    topk: int = 10,
) -> DataFrame:
    """Fuse named ranked shortlists by reciprocal rank.

    ``legs`` is ``[(name, df)]`` where each df has (id_col, rank_col);
    output is ``(id_col, {name}_rank ..., rrf_score)`` — the per-leg
    ranks kept as nullable columns so the report shows WHY a document
    fused high (lexical hit, vector hit, or both).

    The fold is a chain of full outer joins in leg order (each side is
    a k-row shortlist) and the score is the leg-ordered sum of
    ``coalesce(1.0/(k0 + rank), 0.0)`` — fixed addition order, exact
    SQL replay.

    Leg names become ``{name}_rank`` output columns, so they are
    validated up front (ADVICE r10): each must be a non-empty
    identifier (letters/digits/underscore, not starting with a
    digit — anything else breaks unquoted column resolution), unique
    across legs, and distinct from ``id_col`` and ``rrf_score`` —
    a duplicate would produce two ``{name}_rank`` columns and an
    ambiguous-column failure only at analysis time, or silently wrong
    provenance.
    """
    if not legs:
        raise ValueError("rrf_fuse needs at least one leg")
    seen: set[str] = set()
    for name, _ in legs:
        if not name or not name.isidentifier():
            raise ValueError(
                f"rrf_fuse leg name must be a non-empty identifier: {name!r}"
            )
        if name in seen:
            raise ValueError(f"duplicate rrf_fuse leg name: {name!r}")
        if f"{name}_rank" in (id_col, "rrf_score") or name in (id_col, "rrf_score"):
            raise ValueError(
                f"rrf_fuse leg name collides with output column: {name!r}"
            )
        seen.add(name)
    fused: DataFrame | None = None
    for name, df in legs:
        leg = df.select(
            F.col(id_col), F.col(rank_col).cast("long").alias(f"{name}_rank")
        )
        fused = leg if fused is None else fused.join(leg, id_col, "full_outer")
    score = None
    for name, _ in legs:
        contrib = F.coalesce(
            F.lit(1.0) / (F.lit(k0) + F.col(f"{name}_rank")), F.lit(0.0)
        )
        score = contrib if score is None else score + contrib
    return (
        fused.withColumn("rrf_score", score)
        .orderBy(F.col("rrf_score").desc(), F.col(id_col))
        .limit(topk)
    )
