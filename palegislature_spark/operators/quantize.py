"""Int8 vector quantization — embedding storage compression.

At 100 TB scale the embedding column dominates storage and shuffle
width: a 768-dim float32 vector is 3 KB/row, its symmetric-int8
quantization 772 bytes (vector + one float scale) at a typical <1%
recall cost — the standard serving-index trade (FAISS SQ8). Both
directions are pure JVM array expressions (no UDF), so quantization
composes with every similarity operator here.

Engine-exactness discipline (same contract as the rest of the repo's
oracles): every step is an IEEE-exact operation — abs/max, one
division by 127, ``floor(x/scale + 0.5)`` instead of ``round()``
(Spark rounds HALF_UP, DuckDB half-away; floor+0.5 is the same
bit-exact primitive everywhere), products and ordered-fold sums.
No libm transcendentals, so the DuckDB replay matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def with_quantized(
    df: DataFrame,
    vec_col: str = "embedding",
    out_vec: str = "qvec",
    out_scale: str = "scale",
) -> DataFrame:
    """Attach symmetric int8 quantization: ``scale = max|x|/127``,
    ``q_i = floor(x_i/scale + 0.5)`` clamped by construction to
    [-127, 127]; all-zero vectors quantize to zeros with scale 0."""
    v = _as_double(vec_col)
    scale = (F.array_max(F.transform(v, F.abs)) / F.lit(127.0)).alias(
        out_scale
    )
    df = df.withColumn(out_scale, scale)
    q = F.when(
        F.col(out_scale) == 0.0,
        F.transform(v, lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            v,
            lambda x: F.floor(x / F.col(out_scale) + F.lit(0.5)).cast("int"),
        )
    )
    return df.withColumn(out_vec, q)


def dequantize(qvec_col: str, scale_col: str) -> F.Column:
    """Reconstruct the double vector: ``q_i * scale``."""
    return F.transform(
        F.col(qvec_col), lambda q: q.cast("double") * F.col(scale_col)
    )


def int8_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k under int8 quantization: rank by the cosine of the
    QUANTIZED vectors — (query_id, neighbor_id, rank, cosine), rank 1
    = highest quantized cosine, ties to the smaller neighbor_id.

    The symmetric per-vector scales CANCEL in cosine
    (dot(q_a*s_a, q_b*s_b) / (s_a|q_a| * s_b|q_b|) =
    dot_int(q_a, q_b) / (|q_a| |q_b|)), so the ranking is pure
    integer arithmetic — an exact int64 dot and two exact int64
    squared norms — plus one correctly-rounded sqrt/divide, which is
    what lets the DuckDB twin replay the ORDER bit-for-bit and the
    serving index store codes only, never scales, for ranking.

    This is the measurement leg of the int8 trade
    (compress_embeddings_int8 prices the storage side; recall of this
    ranking vs exact float cosine — ann_int8_recall — prices the
    quality side).  Scale: the query panel broadcasts against one
    linear corpus pass (the knn_bruteforce shape — the exact
    measurement IS the cost); the served scale paths remain
    IVF/LSH/PQ."""
    qq = with_quantized(
        queries.select(F.col(id_col).alias("query_id"), vec_col),
        vec_col, out_vec="__qa", out_scale="__sa",
    ).select(
        "query_id",
        "__qa",
        F.aggregate(
            F.col("__qa"), F.lit(0).cast("long"),
            lambda a, x: a + (x * x).cast("long"),
        ).alias("__na2"),
    )
    qc = with_quantized(
        embeddings.select(F.col(id_col).alias("neighbor_id"), vec_col),
        vec_col, out_vec="__qb", out_scale="__sb",
    ).select(
        "neighbor_id",
        "__qb",
        F.aggregate(
            F.col("__qb"), F.lit(0).cast("long"),
            lambda a, x: a + (x * x).cast("long"),
        ).alias("__nb2"),
    )
    pairs = (
        F.broadcast(qq)
        .join(qc, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                F.aggregate(
                    F.zip_with(
                        F.col("__qa"), F.col("__qb"),
                        lambda x, y: (x * y).cast("long"),
                    ),
                    F.lit(0).cast("long"),
                    lambda a, x: a + x,
                ).cast("double")
                / (
                    F.sqrt(F.col("__na2").cast("double"))
                    * F.sqrt(F.col("__nb2").cast("double"))
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "cosine",
        )
    )


def reconstruction_mse(
    vec_col: str, qvec_col: str, scale_col: str
) -> F.Column:
    """Mean squared reconstruction error, summed as an ordered fold so
    the value is bit-reproducible (x*x, never pow — libm-free)."""
    diffs = F.zip_with(
        _as_double(vec_col),
        F.col(qvec_col),
        lambda x, q: (x - q.cast("double") * F.col(scale_col))
        * (x - q.cast("double") * F.col(scale_col)),
    )
    total = F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d)
    return total / F.size(F.col(vec_col))
