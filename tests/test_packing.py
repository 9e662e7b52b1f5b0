"""Sequence packing: offsets equal a sequential scan, chunks cover the
stream, the plan never sorts the data through one global window."""

from __future__ import annotations

import pytest

from palegislature_spark.operators.packing import (
    chunk_membership,
    pack_sequences,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(["w"] * ((i * 7) % 23 + (0 if i % 11 else 0))))
            for i in range(300)]
    # sprinkle empties (token count 0 must claim no chunk)
    rows[5] = (5, "")
    rows[100] = (100, "")
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_offsets_match_sequential_scan(spark, docs):
    out = {
        r["doc_id"]: r
        for r in pack_sequences(docs, budget=64, bucket_size=50).collect()
    }
    running = 0
    for i in sorted(out):
        r = out[i]
        assert r["start_offset"] == running, f"doc {i}"
        if r["n_tokens"] > 0:
            assert r["first_chunk"] == r["start_offset"] // 64
            assert r["last_chunk"] == (r["start_offset"] + r["n_tokens"] - 1) // 64
        else:
            assert r["first_chunk"] is None and r["last_chunk"] is None
        running += r["n_tokens"]


def test_bucket_size_invariance(spark, docs):
    a = sorted(map(tuple, pack_sequences(docs, 64, bucket_size=7).collect()))
    b = sorted(map(tuple, pack_sequences(docs, 64, bucket_size=1000).collect()))
    assert a == b


def test_chunk_membership_covers_stream(spark, docs):
    packed = pack_sequences(docs, budget=64, bucket_size=50)
    member = chunk_membership(packed).collect()
    total = sum(r["n_tokens"] for r in packed.collect())
    n_chunks = -(-total // 64)
    chunks = {r["chunk_id"] for r in member}
    assert chunks == set(range(n_chunks))  # no gaps, no phantom chunks


def test_no_global_single_partition_window(spark, docs):
    plan = pack_sequences(docs, 64)._jdf.queryExecution().executedPlan().toString()
    # the data-sized window must be partitioned by bucket; a global
    # Window would show 'Window [...]' with no partition spec after a
    # single-partition Exchange. Assert every Window node carries a
    # partition expression on the data path (the bucket-offsets window
    # runs over the bucket-count-sized aggregate only).
    import re
    windows = [l for l in plan.splitlines() if "Window " in l]
    partitioned = [l for l in windows if "windowspecdefinition(__bkt" in l]
    assert partitioned, plan
