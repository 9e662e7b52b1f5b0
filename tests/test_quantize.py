"""Int8 quantization tests: range, round-trip error bound, edge cases,
recall preservation through the similarity stack."""

from __future__ import annotations

import math

import pytest

from palegislature_spark.operators import quantize, similarity
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (i, [math.sin(i * 1.7 + d) for d in range(8)]) for i in range(50)
    ]
    rows.append((100, [0.0] * 8))  # all-zero edge
    return spark.createDataFrame(rows, SCHEMA)


def test_quantized_range_and_zero_vector(vecs):
    out = quantize.with_quantized(vecs).collect()
    for r in out:
        assert all(-127 <= q <= 127 for q in r["qvec"])
        if r["vec_id"] == 100:
            assert r["scale"] == 0.0 and set(r["qvec"]) == {0}
        else:
            # the max-|x| component must hit full scale
            assert max(abs(q) for q in r["qvec"]) == 127


def test_reconstruction_error_bounded_by_half_step(vecs):
    out = quantize.with_quantized(vecs).select(
        "vec_id",
        "scale",
        quantize.reconstruction_mse("embedding", "qvec", "scale").alias("mse"),
    ).collect()
    for r in out:
        # per-component error <= scale/2, so mse <= (scale/2)^2
        assert r["mse"] <= (r["scale"] / 2) ** 2 + 1e-12


def test_dequantize_roundtrip_close(vecs, spark):
    out = quantize.with_quantized(vecs).withColumn(
        "recon", quantize.dequantize("qvec", "scale")
    )
    row = out.filter("vec_id = 3").collect()[0]
    for x, y in zip(row["embedding"], row["recon"]):
        assert abs(x - y) <= row["scale"] / 2 + 1e-12


def test_quantized_knn_recall(spark, vecs):
    """Top-3 neighbours computed on dequantized vectors overlap the
    float results heavily — the trade quantization is for."""
    real = vecs.filter("vec_id < 100")
    dq = quantize.with_quantized(real).select(
        "vec_id", quantize.dequantize("qvec", "scale").alias("embedding")
    )
    queries = real.filter("vec_id < 10")
    queries_dq = dq.filter("vec_id < 10")
    exact = similarity.brute_force_topk(real, queries, k=3)
    approx = similarity.brute_force_topk(dq, queries_dq, k=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.8


def test_int8_topk_matches_dequantized_ranking(spark, vecs):
    """The scale-cancellation identity: ranking by integer-code cosine
    (int8_topk — scales never read) equals ranking dequantized vectors
    by float cosine, because cosine(q*s_a, c*s_b) == cosine(q, c)."""
    real = vecs.filter("vec_id < 100")
    queries = real.filter("vec_id < 10")
    got = quantize.int8_topk(real, queries, k=3)
    dq = quantize.with_quantized(real).select(
        "vec_id", quantize.dequantize("qvec", "scale").alias("embedding")
    )
    want = similarity.brute_force_topk(dq, dq.filter("vec_id < 10"), k=3)
    g = sorted((r["query_id"], r["neighbor_id"], r["rank"]) for r in got.collect())
    w = sorted((r["query_id"], r["neighbor_id"], r["rank"]) for r in want.collect())
    assert g == w


def test_int8_recall_registry_shape(spark):
    """ann_int8_recall: one row per panel query, hits <= exact_k <= 5,
    recall the exact int/int division — and int8's measured quality on
    the worst-case near-uniform corpus stays above the random floor."""
    from palegislature_spark.queries.vectors import ann_int8_recall

    rows = ann_int8_recall(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r.hits <= r.exact_k <= 5
        assert r.recall == r.hits / r.exact_k
    mean = sum(r.recall for r in rows) / len(rows)
    # random recall@5 over a 500-vector corpus is ~1%; SQ8 keeps most
    # of the exact order even on unclustered vectors
    assert mean >= 0.5
