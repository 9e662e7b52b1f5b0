"""Similarity-search queries over the embeddings table.

Brute-force exact cosine top-k is the oracle-checked baseline; the
LSH-bucketed variant is the scale path (rows-only check — approximate
by construction, its recall is asserted in tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from palegislature_spark.catalog import load
from palegislature_spark.operators import similarity
from palegislature_spark.queries.registry import register

# Cosine in double precision on both engines; 6dp rounding absorbs
# float-associativity drift without masking real mismatches.
_COS = "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"


@register(
    "knn_bruteforce",
    covers="similarity-search extension: exact cosine top-k (query set vs corpus)",
    oracle=f"""
WITH pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id < 20 AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank,
         cos
  FROM pairs
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(cos, 6) AS cosine
FROM ranked WHERE rank <= 5
""",
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for the first 20 vectors.

    Scale: the query side broadcasts; corpus scan is one pass; rank is
    a per-query window. At 100 TB the same plan works with a bounded
    query batch; unbounded all-pairs goes through lsh_topk instead.
    """
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    topk = similarity.brute_force_topk(emb, queries, k=5)
    return topk.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


@register(
    "knn_lsh",
    covers="similarity-search extension: LSH-bucketed approximate top-k (scale path; "
    "approximate => rows-only check, recall asserted in tests)",
    oracle=None,
)
def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane buckets + multiprobe."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    topk = similarity.lsh_topk(emb, queries, k=5, dim=64, n_planes=4)
    return topk.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


@register(
    "embedding_near_dup",
    covers="dedup extension: embedding-cosine near-duplicate pairs",
    oracle=f"""
SELECT a.vec_id AS id_1, b.vec_id AS id_2, round({_COS}, 4) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_COS} >= 0.45
""",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs with cosine >= 0.45 via lossless projection bucketing —
    candidates come from an EQUI-join on a Rademacher-projection
    bucket (zero-miss by the Cauchy-Schwarz bound, so the exact
    all-pairs oracle still matches), never a cartesian; plan-asserted
    in tests/test_plans.py."""
    emb = load(spark, sf_dir, "embeddings")
    pairs = similarity.near_dup_pairs(emb, "vec_id", "embedding", threshold=0.45)
    return pairs.select("id_1", "id_2", F.round("cosine", 4).alias("cosine"))


@register(
    "vector_stats",
    covers="similarity-search extension: vector norms/aggregates (array math, JVM-side)",
    oracle="""
SELECT label,
       count(*) AS n_vecs,
       round(sum(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))), 6) / count(*) AS avg_norm,
       round(sum(list_sum(CAST(embedding AS DOUBLE[])) / len(embedding)), 6) / count(*) AS avg_mean_component
FROM embeddings GROUP BY label
""",
)
def vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label norm and component statistics."""
    emb = load(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sum_sq = F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    vsum = F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x)
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (F.round(F.sum(F.sqrt(sum_sq)), 6) / F.count(F.lit(1))).alias("avg_norm"),
        (F.round(F.sum(vsum / F.size("embedding")), 6) / F.count(F.lit(1))).alias("avg_mean_component"),
    )


@register(
    "knn_ivf",
    covers="similarity-search extension: IVF inverted-list approximate top-k "
    "(the second scale path beside LSH; approximate => rows-only check, "
    "recall asserted in tests)",
    oracle=None,
)
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via IVF lists (sampled-point centroids, 2 probes)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    topk = similarity.ivf_topk(emb, queries, k=5, n_lists=8, n_probe=2)
    return topk.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )
