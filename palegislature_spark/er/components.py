"""Connected components over match edges (SURVEY §4.3.3).

The reference merges pairwise groups keyed by the lowest member id in
each block (``find_duplicates.py:69-110``), which under-merges when
matches chain across blocks. The correct general construction is
connected components; match graphs here are tiny per block (a few
edges per surname), so min-label propagation converges in a handful
of rounds.

Algorithm: repeat { label(v) = min(label(v), min over neighbors'
labels) } until no label changes — converges in O(component
diameter) rounds. Each round is one groupBy-min plus one join —
shuffle-bounded, no driver-side graph. Iterations are capped and each
round's result is localCheckpoint()ed to keep lineage flat; hitting
the cap before a fixpoint raises (silent under-merge is worse than a
loud failure). Path-halving contraction (the Kiveris large-star/
small-star scheme, O(log n) rounds) is the upgrade path if diameters
ever grow past the cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_1",
    dst: str = "id_2",
    max_iterations: int = 20,
) -> DataFrame:
    """Label each vertex with the min vertex id of its component.

    Input: undirected edge list (any orientation, duplicates fine).
    Output: (id, component) for every vertex that appears in an edge;
    ``component`` is the smallest id in the connected component.
    """
    spark = edges.sparkSession
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    # initial label: min neighbor (including self)
    labels = (
        sym.union(sym.select("a", F.col("a").alias("b")))
        .groupBy("a")
        .agg(F.min("b").alias("comp"))
        .localCheckpoint()
    )
    # Per-round join shape (guide §2.4/§3.1, the pagerank r12 gate):
    # the label table is VERTEX-sized, the edge list EDGE-sized, and
    # checkpointed frames carry no stats, so the planner sort-merge-
    # joins — re-shuffling `sym` on `b` EVERY round.  Below the gate
    # (vertices = near-dup doc ids, a table of two longs per vertex)
    # broadcast the label side so `sym` is never shuffled; above it,
    # hash-partition `sym` by the join key ONCE so every round reuses
    # that one exchange.  Join strategy never changes join results —
    # min-label propagation is order-free.
    n_vertices = labels.count()
    small_labels = n_vertices <= int(2e6)
    if not small_labels:
        sym = sym.repartition("b").localCheckpoint()
    _bcast = F.broadcast if small_labels else (lambda df: df)
    for _ in range(max_iterations):
        # propagate: candidate label for a = min over neighbors' labels
        neighbor_labels = (
            sym.join(_bcast(labels.withColumnRenamed("a", "b")), "b")
            .groupBy("a")
            .agg(F.min("comp").alias("ncomp"))
        )
        # The moved flag is computed INLINE on the propagation join —
        # the old label is already on the row — so the convergence
        # check below is a filter over the checkpointed RDD instead of
        # a second join+broadcast job per round (one fewer Spark job
        # per iteration; the label values are identical).
        new_labels = (
            labels.join(_bcast(neighbor_labels), "a", "left")
            .select(
                "a",
                F.least(
                    F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                ).alias("comp"),
                (F.coalesce(F.col("ncomp"), F.col("comp")) < F.col("comp")).alias(
                    "__moved"
                ),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter("__moved").limit(1).count()
        labels = new_labels.select("a", "comp")
        if changed == 0:
            break
    else:
        # Min-label propagation converges in O(component diameter)
        # rounds; exiting the cap with labels still moving means some
        # component is only partially merged — silent under-merge is
        # an ER correctness bug, not a tuning knob (ADVICE r1).
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations — a component's diameter exceeds the cap; raise "
            "max_iterations"
        )
    return labels.select(F.col("a").alias("id"), F.col("comp").alias("component"))
