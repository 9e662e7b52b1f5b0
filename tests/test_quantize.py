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
