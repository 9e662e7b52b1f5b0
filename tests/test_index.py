"""Inverted-index build/serve tests: the index-served BM25 ranking
must reproduce the full-scan ranking bit for bit, and posting
segments must respect the shard discipline."""

from __future__ import annotations

from pyspark.sql import functions as F

from palegislature_spark.catalog import load
from palegislature_spark.operators.index import (
    build_inverted_index,
    bm25_search_topk,
)

TERMS = ("spark", "hash", "window", "merge")


def test_index_search_equals_fullscan_bm25(spark, sf_dir):
    from palegislature_spark.queries.corpus import bm25_relevance

    docs = load(spark, sf_dir, "documents")
    idx = build_inverted_index(docs, n_shards=4)
    got = [
        (r.doc_id, r.score)
        for r in bm25_search_topk(idx, TERMS, k=10).collect()
    ]
    scan = bm25_relevance(spark, sf_dir)
    want = [
        (r.doc_id, r.score)
        for r in scan.filter(F.col("score") > 0)
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
        .collect()
    ]
    assert got == want  # exact float equality: same IEEE op chain


def test_postings_sharded_and_df_consistent(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    idx = build_inverted_index(docs, n_shards=4)
    seg = idx["postings"].filter(F.col("token") == "spark")
    rows = seg.collect()
    # every posting entry lives in the shard its doc id HASHES to
    # (pmod(xxhash64) — id % n would NULL out non-numeric ids)
    shard_of = {
        r.doc_id: r.shard
        for r in docs.select(
            "doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(4)).alias("shard")
        ).collect()
    }
    for r in rows:
        for p in r.postings:
            assert shard_of[p.doc_id] == r.shard
    # no NULL shards even for string ids
    str_idx = build_inverted_index(
        docs.select(F.concat(F.lit("doc-"), "doc_id").alias("doc_id"), "text"),
        n_shards=4,
    )
    assert str_idx["postings"].filter(F.col("shard").isNull()).count() == 0
    assert str_idx["postings"].select("shard").distinct().count() == 4
    # shard-partial dfs sum to the true document frequency
    df_total = sum(r.df_partial for r in rows)
    true_df = (
        docs.filter(
            F.array_contains(F.split("text", " "), "spark")
        ).count()
    )
    assert df_total == true_df


def test_search_plan_is_distributed_topk(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    idx = build_inverted_index(docs, n_shards=4)
    plan = (
        bm25_search_topk(idx, TERMS, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
