"""PageRank — iterative link analysis on a DataFrame edge list.

The unnormalized damped form (Page et al. 1999; the PR-lite every
graph engine ships): rank' = (1 - d) + d * sum(incoming rank/out_deg),
iterated a fixed number of rounds. Complements the repo's other
iterative operators — connected components (`er/components.py`), the
BPE trainer and the Lloyd refinement — with the weighted-propagation
case.

Spark shape: each round is one join of the rank table onto the edge
list plus one aggregation on the destination — both shuffles on graph
keys, nothing driver-sized. The DISTINCT edge list, node set and
out-degrees are localCheckpoint()ed ONCE (they are re-read every
round; without the checkpoint the upstream build — here an
orders x lineitem join + distinct — re-executes per round, which
measured 1.6-2.2x slower at sf0.1), while the evolving rank table is
checkpointed only every ``ckpt_every`` rounds: for small iteration
counts rank lineage is shallow and a per-round materialization costs
more than it saves (also measured), but unbounded growth would bite
at 20+ rounds — the periodic compromise keeps both regimes safe.

Determinism: the default (scale) path sums incoming contributions
with a plain float sum — order-free semantics, engine-specific bits.
``exact_replay=True`` folds each node's contributions in source-id
order (bounded by in-degree), which a DuckDB oracle replays with an
ordered ``list_reduce`` — the same dual-path discipline as the IVF
Lloyd refinement (scale default + bit-reproducible twin for the
oracle-pinned registry query).

``fold_impl`` selects how the ordered fold executes.  The r12
optimization round built an Arrow-batched numpy twin
(``fold_impl='arrow'``, bit-equality pinned in tests/test_graph.py
across batch regimes) on the theory that the interpreted HOF
aggregate — which never enters whole-stage codegen — was the fold's
cost.  Measurement says otherwise ACROSS SCALES: the kernel wins
~8% on the sf0.1 supplier graph (3.2s vs 3.5s) but loses 3x at the
100x replica (209s vs 67s, min-of-2 idle) — the kernel's
repartition+full-partition-sort and the 45M-row-per-round Arrow
round-trip dwarf the interpreted fold, while the expression path's
ObjectHashAggregate does JVM map-side partial_collect_list with no
Python boundary and no global sort.  The EXPRESSION fold is
therefore the default and the 100 TB configuration; the kernel is
kept as the measured negative result and equality anchor.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fold_sums_arrow(contribs: DataFrame) -> DataFrame:
    """(dst, s): each destination's incoming contributions folded
    sequentially in source-id order — the Arrow twin of the
    exact_replay HOF aggregate (collect_list -> array_sort -> left
    fold), bit-identical by the codec-kernel argument (same IEEE adds
    in the same order, one rounding per step — per-segment np.cumsum
    for long segments, a depth loop across destinations for short
    ones; see the strategy comment in ``gen`` for the measured
    regimes).  The 0.0 init matches the fold's zero literal (0.0 + x == x
    for every value the graph produces; contributions are rank/deg,
    never -0.0).  Cost shape is unchanged — one hash exchange on dst
    either way (partial_collect_list ships every element too) — but
    the per-element work leaves the expression interpreter.  Rows
    reach the kernel partition-sorted by (dst, src), the same Spark
    UTF8-binary order array_sort applies to the (src, c) structs (src
    is unique per group: the edge list is DISTINCT); a group spanning
    Arrow batches is carried via the running accumulator.
    """
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [contribs.schema["dst"], T.StructField("s", T.DoubleType())]
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        carry_key, carry_acc, have_carry = None, 0.0, False
        for pdf in batches:
            if not len(pdf):
                continue
            dst = pdf["dst"].to_numpy()
            c = pdf["c"].to_numpy(dtype="float64")
            starts = np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]])
            ends = np.r_[starts[1:], len(dst)]
            n_seg = len(starts)
            acc = np.zeros(n_seg, dtype=np.float64)
            seed0 = 0.0
            done_key, done_sum, have_done = None, 0.0, False
            if have_carry:
                if dst[0] == carry_key:
                    # continue the spanning group's fold where it left off
                    seed0 = carry_acc
                else:
                    done_key, done_sum, have_done = carry_key, carry_acc, True
                have_carry = False
            # Two bit-equal fold strategies (both are the sequential
            # left fold — one rounding per element in (dst, src)
            # order), picked per batch by segment shape:
            #  * LONG segments (high in-degree, few groups per batch —
            #    the 100x supplier graph): per-segment np.cumsum, whose
            #    output is definitionally every sequential partial sum;
            #    a depth loop here degenerates to in-degree-many numpy
            #    calls on tiny index arrays (measured 2.5 ms vs 0.1 ms
            #    per 10k-row batch).
            #  * SHORT segments (many groups per batch): a depth loop —
            #    step j adds every group's j-th contribution; cumsum
            #    here pays one Python-loop iteration per GROUP
            #    (measured 13 ms vs 0.2 ms per batch).
            if n_seg * 8 <= len(dst):
                for g in range(n_seg):
                    seg = c[starts[g] : ends[g]]
                    if g == 0 and seed0 != 0.0:
                        seg = np.r_[seed0, seg]
                    acc[g] = np.cumsum(seg)[-1]
            else:
                acc[0] = seed0
                idx = starts.copy()
                active = np.arange(n_seg)
                while active.size:
                    acc[active] += c[idx[active]]
                    idx[active] += 1
                    active = active[idx[active] < ends[active]]
            # the last group may continue in the next batch
            carry_key, carry_acc, have_carry = (
                dst[starts[-1]],
                float(acc[-1]),
                True,
            )
            if n_seg > 1 or have_done:
                out = pd.DataFrame({"dst": dst[starts[:-1]], "s": acc[:-1]})
                if have_done:
                    out = pd.concat(
                        [pd.DataFrame({"dst": [done_key], "s": [done_sum]}), out],
                        ignore_index=True,
                    )
                yield out
        if have_carry:
            yield pd.DataFrame({"dst": [carry_key], "s": [carry_acc]})

    return (
        contribs.repartition("dst")
        .sortWithinPartitions("dst", "src")
        .select("dst", "c")
        .mapInPandas(gen, out_schema)
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    exact_replay: bool = False,
    ckpt_every: int = 5,
    fold_impl: str = "expr",
) -> DataFrame:
    """(node, rank) after ``iters`` damped propagation rounds over the
    DISTINCT directed edge list. Dangling nodes (no out-edges) simply
    contribute nothing; nodes with no in-edges settle at 1 - d."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # Join-strategy gate (guide §3.1 / §2.4): the rank and degree
    # tables are NODE-sized while the edge list is EDGE-sized, yet the
    # checkpointed frames carry no size stats, so the planner
    # sort-merge-joins every round — shuffling the whole edge list on
    # `src` once per iteration (captured in
    # plans/r12/centrality_rank_suppliers_before.txt: one Exchange of
    # `e` per round).  Gate on the actual node count (the decontam
    # count-gated broadcast-flip precedent): below the threshold the
    # node-sized tables broadcast and `e` is never shuffled at all
    # (the one fundamental shuffle left per round is the map-side-
    # combined groupBy(dst)); above it — the 100 TB graph — hash-
    # partition `e` by `src` ONCE at build so every round's join and
    # the degree aggregate reuse that exchange instead of repaying it
    # (guide §2.4: two operations keyed the same way share one
    # exchange).  Both regimes compute identical values: the
    # exact_replay fold is order-pinned by array_sort, and join
    # strategy never changes join RESULTS.
    # Gate threshold, measured at the 100x replica (1.65M nodes, 45M
    # edges, idle min-of-2 per leg): for the PLAIN-SUM leg the regimes
    # are a wash (38.1s broadcast vs 39.1s repartition — the map-side
    # combined sum collapses each round before its exchange either
    # way), but for the EXACT fold the broadcast regime is a 2.4x
    # regression (170.6s vs 71.4s): partial_collect_list keeps every
    # element, so nothing shrinks before the exchange, and each
    # round's rank broadcast serializes the previous round's full
    # 45M-struct aggregation through a driver-built broadcast relation
    # instead of a pipelined shuffle stage.  Hence the exact leg flips
    # to the repartition regime a decade earlier; both thresholds are
    # env-overridable for other cluster shapes.
    n_nodes = nodes.count()
    small_nodes = n_nodes <= int(
        os.environ.get(
            "SPARK_GRAFT_PAGERANK_BCAST_MAX_NODES",
            str(int(2e5 if exact_replay else 2e6)),
        )
    )
    if not small_nodes:
        e = e.repartition("src").localCheckpoint()
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .localCheckpoint()
    )
    _bcast = F.broadcast if small_nodes else (lambda df: df)
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for i in range(iters):
        contribs = (
            e.join(_bcast(ranks.withColumnRenamed("node", "src")), "src")
            .join(_bcast(deg), "src")
            .select("dst", "src", (F.col("rank") / F.col("deg")).alias("c"))
        )
        if exact_replay and fold_impl == "arrow":
            sums = _fold_sums_arrow(contribs)
        elif exact_replay:
            sums = contribs.groupBy("dst").agg(
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("src", "c"))),
                        lambda s: s["c"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("s")
            )
        else:
            sums = contribs.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = nodes.join(
            _bcast(sums.withColumnRenamed("dst", "node")), "node", "left"
        ).select(
            "node",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce("s", F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % ckpt_every == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint()
    return ranks


def supplier_purchase_edges(spark, sf_dir: str) -> DataFrame:
    """The customer -> supplier purchase graph (distinct 'c<custkey>'
    -> 's<suppkey>' edges via orders x lineitem) — shared by the
    oracle-pinned registry query and the bench scale row so both rank
    the SAME graph; the SQL twin lives in queries/corpus.py
    (_SUPPLIER_EDGES_SQL)."""
    from palegislature_spark.catalog import load

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    return orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
