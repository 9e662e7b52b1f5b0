"""Bucketed-join tests: same-bucketed tables join without a shuffle;
results equal the plain join."""

from __future__ import annotations

import pytest

from palegislature_spark.sources import bucketed
from pyspark.sql import functions as F
from tests.conftest import rows


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    orders = spark.range(0, 2000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_flag")
    )
    items = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("o_key"), F.col("id").alias("item_id")
    )
    bucketed.write_bucketed(orders, "b_orders", ["o_key"], 8)
    bucketed.write_bucketed(items, "b_items", ["o_key"], 8, sort_cols=["o_key"])
    yield orders, items
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


def test_bucketed_join_no_shuffle(spark, tables):
    joined = bucketed.bucketed_join(spark, "b_orders", "b_items", ["o_key"])
    assert not bucketed.has_shuffle_before_join(joined)
    # sanity: the same join over unbucketed frames DOES shuffle
    orders, items = tables
    plain = orders.join(items, "o_key")
    assert bucketed.has_shuffle_before_join(plain)


def test_bucketed_join_matches_plain(spark, tables):
    orders, items = tables
    want = rows(orders.join(items, "o_key"), "o_key", "item_id", "o_flag")
    got = rows(
        bucketed.bucketed_join(spark, "b_orders", "b_items", ["o_key"]),
        "o_key",
        "item_id",
        "o_flag",
    )
    assert got == want and len(got) == 6000
