"""Similarity-search operator tests (hand-computed cosine geometry)."""

from __future__ import annotations

import math

import pytest

from palegislature_spark.operators import similarity
from tests.conftest import rows

# 4-dim unit-ish vectors with known geometry.
VECS = [
    (1, [1.0, 0.0, 0.0, 0.0]),
    (2, [0.9, 0.1, 0.0, 0.0]),  # closest to 1
    (3, [0.0, 1.0, 0.0, 0.0]),  # orthogonal to 1
    (4, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 1
    (5, [0.5, 0.5, 0.0, 0.0]),
]


@pytest.fixture(scope="module")
def vecs(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(VECS, schema)


def test_with_norm(vecs):
    norms = {r["vec_id"]: r["norm"] for r in similarity.with_norm(vecs, "embedding").collect()}
    assert abs(norms[1] - 1.0) < 1e-6
    assert abs(norms[5] - math.sqrt(0.5)) < 1e-6


def test_brute_force_topk_ordering(vecs):
    queries = vecs.filter("vec_id = 1")
    got = rows(
        similarity.brute_force_topk(vecs, queries, k=4),
        "query_id",
        "rank",
        "neighbor_id",
    )
    # cos(1,2)≈0.994 > cos(1,5)≈0.707 > cos(1,3)=0 > cos(1,4)=-1
    assert got == [(1, 1, 2), (1, 2, 5), (1, 3, 3), (1, 4, 4)]


def test_brute_force_cosine_values(vecs):
    queries = vecs.filter("vec_id = 1")
    cos = {
        r["neighbor_id"]: r["cosine"]
        for r in similarity.brute_force_topk(vecs, queries, k=4).collect()
    }
    assert abs(cos[3] - 0.0) < 1e-6
    assert abs(cos[4] + 1.0) < 1e-6
    assert abs(cos[2] - (0.9 / math.sqrt(0.81 + 0.01))) < 1e-6


def test_lsh_topk_schema_and_rank_contract(vecs):
    got = similarity.lsh_topk(vecs, vecs.filter("vec_id = 1"), k=3, dim=4, n_planes=2)
    assert got.columns == ["query_id", "neighbor_id", "rank", "cosine"]
    collected = got.collect()
    # ranks are 1..n without gaps, never exceeding k, self excluded
    ranks = sorted(r["rank"] for r in collected)
    assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 3
    assert all(r["neighbor_id"] != 1 for r in collected)


def test_lsh_recall_against_brute_force(spark):
    # 2-dim clustered vectors: LSH with multiprobe should recover the
    # exact top-1 (same-cluster) neighbor for every query.
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    pts = []
    for i in range(10):
        angle = (i % 2) * 1.5 + (i * 0.01)  # two tight clusters
        pts.append((i, [math.cos(angle), math.sin(angle)]))
    df = spark.createDataFrame(pts, schema)
    brute = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.brute_force_topk(df, df, k=1).collect()
    }
    lsh = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.lsh_topk(df, df, k=1, dim=2, n_planes=2).collect()
    }
    hits = sum(1 for k, v in brute.items() if lsh.get(k) == v)
    assert hits >= 8  # >=80% top-1 recall on trivially clustered data
