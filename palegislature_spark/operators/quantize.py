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
