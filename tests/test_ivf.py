"""IVF similarity tests: index shape, recall on clustered data."""

from __future__ import annotations

import math

import pytest

from palegislature_spark.operators import similarity
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


@pytest.fixture(scope="module")
def clustered(spark):
    pts = []
    for i in range(40):
        angle = (i % 4) * 1.5 + (i * 0.005)  # four tight clusters
        pts.append((i, [math.cos(angle), math.sin(angle)]))
    return spark.createDataFrame(pts, SCHEMA)


def test_ivf_assignments_cover_corpus(clustered):
    centroids, assignments = similarity.ivf_assignments(clustered, n_lists=4)
    assert centroids.count() == 4
    rows = assignments.collect()
    assert len(rows) == 40  # every vector assigned exactly once
    assert {r["list_id"] for r in rows} <= {1, 2, 3, 4}


def test_ivf_topk_schema_and_recall(clustered):
    got = similarity.ivf_topk(clustered, clustered, k=1, n_lists=4, n_probe=2)
    assert got.columns == ["query_id", "neighbor_id", "rank", "cosine"]
    ivf = {r["query_id"]: r["neighbor_id"] for r in got.collect()}
    brute = {
        r["query_id"]: r["neighbor_id"]
        for r in similarity.brute_force_topk(clustered, clustered, k=1).collect()
    }
    hits = sum(1 for q, n in brute.items() if ivf.get(q) == n)
    # same-cluster neighbors live in the same (or probed) list
    assert hits >= 32  # >=80% top-1 recall


def test_ivf_deterministic(clustered):
    a = sorted(map(tuple, similarity.ivf_topk(clustered, clustered, k=1).collect()))
    b = sorted(map(tuple, similarity.ivf_topk(clustered, clustered, k=1).collect()))
    assert a == b


@pytest.fixture(scope="module")
def skewed(spark):
    """One dense cluster (most sampled-point centroids land there) +
    three sparse clusters the refinement must move centroids toward."""
    pts = []
    for i in range(60):  # dense cluster near angle 0
        pts.append((i, [math.cos(i * 0.004), math.sin(i * 0.004)]))
    for c in range(3):  # sparse clusters at angles 1.5/3.0/4.5
        for j in range(6):
            i = 60 + c * 6 + j
            a = 1.5 * (c + 1) + j * 0.004
            pts.append((i, [math.cos(a), math.sin(a)]))
    return spark.createDataFrame(pts, SCHEMA)


def _top1_recall(corpus, **kw):
    ivf = {
        r["query_id"]: r["neighbor_id"]
        for r in similarity.ivf_topk(corpus, corpus, k=1, n_lists=4, n_probe=1, **kw).collect()
    }
    brute = {
        r["query_id"]: r["neighbor_id"]
        for r in similarity.brute_force_topk(corpus, corpus, k=1).collect()
    }
    return sum(1 for q, n in brute.items() if ivf.get(q) == n) / len(brute)


def test_ivf_kmeans_refinement_improves_skewed_recall(skewed):
    base = _top1_recall(skewed)
    refined = _top1_recall(skewed, refine_iters=2)
    assert refined >= base
    assert refined >= 0.9  # Lloyd moves centroids out of the dense region


def test_ivf_refined_deterministic(skewed):
    a = sorted(map(tuple, similarity.ivf_topk(skewed, skewed, k=1, refine_iters=2).collect()))
    b = sorted(map(tuple, similarity.ivf_topk(skewed, skewed, k=1, refine_iters=2).collect()))
    assert a == b
