"""Salted join / two-phase aggregation: results must equal the
unsalted plans on skewed data."""

from __future__ import annotations

import pytest

from palegislature_spark.operators import skew
from pyspark.sql import functions as F
from tests.conftest import rows


@pytest.fixture(scope="module")
def skewed(spark):
    # one heavy-hitter key (k=1: 500 rows) + a long tail
    rows_ = [(1, i, float(i % 7)) for i in range(500)] + [
        (k, k * 1000, float(k)) for k in range(2, 20)
    ]
    return spark.createDataFrame(rows_, "k int, payload long, v double")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [(k, f"name{k}") for k in range(0, 25)], "k int, label string"
    )


def test_salted_join_matches_plain(skewed, dim):
    plain = rows(skewed.join(dim, "k"), "k", "payload", "label")
    salted = rows(
        skew.salted_join(skewed, dim, ["k"], salt_cols=["payload"], buckets=8),
        "k",
        "payload",
        "label",
    )
    assert salted == plain
    assert len(salted) == 518


def test_salted_join_left(skewed, dim):
    missing = skewed.withColumn("k", F.col("k") + 100)  # no dim matches
    out = skew.salted_join(missing, dim, ["k"], salt_cols=["payload"], buckets=4, how="left")
    got = out.collect()
    assert len(got) == 518 and all(r["label"] is None for r in got)


def test_salted_agg_matches_plain(skewed):
    plain = rows(
        skewed.groupBy("k").agg(
            F.sum("v").alias("sum_v"),
            F.count("v").alias("count_v"),
            F.min("payload").alias("min_payload"),
            F.max("payload").alias("max_payload"),
        ),
        "k",
        "sum_v",
        "count_v",
        "min_payload",
        "max_payload",
    )
    salted = rows(
        skew.salted_agg(
            skewed,
            ["k"],
            {"v": "sum", "payload": "min"} | {},
            salt_cols=["payload"],
            buckets=16,
        ),
        "k",
    )
    # separate calls because dict agg spec keys are column names
    full = rows(
        skew.salted_agg(
            skewed.withColumn("v2", F.col("v")).withColumn("p2", F.col("payload")),
            ["k"],
            {"v": "sum", "v2": "count", "payload": "min", "p2": "max"},
            salt_cols=["payload"],
            buckets=16,
        ).select(
            "k",
            F.col("sum_v"),
            F.col("count_v2").alias("count_v"),
            F.col("min_payload"),
            F.col("max_p2").alias("max_payload"),
        ),
        "k",
        "sum_v",
        "count_v",
        "min_payload",
        "max_payload",
    )
    assert full == plain
    assert len(salted) == len(plain)


def test_salt_is_deterministic(skewed):
    a = rows(skewed.withColumn("s", skew._salt(["payload"], 8)), "payload", "s")
    b = rows(skewed.withColumn("s", skew._salt(["payload"], 8)), "payload", "s")
    assert a == b
    assert {s for _, s in a} == set(range(8))  # all buckets used
