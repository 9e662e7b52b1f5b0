"""Incremental MinHash dedup: batch-vs-corpus pairs must equal the
full recompute restricted to pairs touching the batch."""

from __future__ import annotations

import pytest

from palegislature_spark.operators import dedup
from palegislature_spark.catalog import load


@pytest.fixture(scope="module")
def split_corpus(spark):
    docs = load(spark, "/root/testdata/sf0.01", "documents")
    corpus = docs.filter("doc_id % 5 != 0")
    batch = docs.filter("doc_id % 5 = 0")
    return docs, corpus, batch


def pairs_set(df):
    return {(r["id_1"], r["id_2"]) for r in df.collect()}


def test_incremental_equals_full_recompute_restricted(spark, split_corpus):
    docs, corpus, batch = split_corpus
    full = dedup.minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    want = {
        p
        for p in pairs_set(full)
        if p[0] in batch_ids or p[1] in batch_ids
    }
    assert want, "fixture must contain near-dup pairs touching the batch"

    index = dedup.minhash_index(corpus, "doc_id", "text", n=3)
    got = dedup.minhash_lsh_pairs_incremental(
        batch, corpus, index, "doc_id", "text", n=3, threshold=0.8
    )
    assert pairs_set(got) == want


def test_incremental_skips_corpus_signature_work(spark, split_corpus, tmp_path):
    """With the index READ FROM DISK (the real pipeline shape — a live
    index DataFrame would lazily recompute corpus signatures through
    its lineage), the incremental plan must not re-sign the corpus:
    corpus text reaches the verify stage only behind the candidate-id
    semi-join, and the only signature aggregate left is the batch's."""
    _, corpus, batch = split_corpus
    idx_path = str(tmp_path / "mh_index")
    dedup.minhash_index(corpus, "doc_id", "text", n=3).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    got = dedup.minhash_lsh_pairs_incremental(
        batch, corpus, index, "doc_id", "text", n=3, threshold=0.8
    )
    # result matches the full recompute restricted to batch-touching
    # pairs (index-from-disk path)
    full = dedup.minhash_lsh_pairs(
        corpus.unionByName(batch), "doc_id", "text", n=3, threshold=0.8
    )
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    want = {
        p for p in pairs_set(full) if p[0] in batch_ids or p[1] in batch_ids
    }
    assert pairs_set(got) == want

    # behavioral proof the corpus side flows through the INDEX, never a
    # recomputed signature pass over corpus text (plan-string proxies
    # are unreliable here — the candidate checkpoint truncates lineage):
    # with an EMPTY index the corpus text is still available, yet every
    # corpus-side pair must vanish, leaving only new-vs-new pairs
    empty = index.limit(0)
    nn_only = dedup.minhash_lsh_pairs_incremental(
        batch, corpus, empty, "doc_id", "text", n=3, threshold=0.8
    )
    nn_want = {p for p in want if p[0] in batch_ids and p[1] in batch_ids}
    assert pairs_set(nn_only) == nn_want
