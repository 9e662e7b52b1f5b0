"""SQL-surface extension queries (SURVEY §2.4/§2.5 'available as
extensions'): ranking windows, cube grouping sets, approximate
aggregates, map/JSON scalar functions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from palegislature_spark.catalog import load
from palegislature_spark.queries.registry import register


@register(
    "window_rank_funcs",
    covers="W5 + ranking extension (SURVEY §2.5: rank/dense_rank/ntile surface)",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def window_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking functions per customer by spend."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "cube_order_stats",
    covers="A3 + cube extension (SURVEY §2.4: grouping sets/cube/rollup surface)",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(o_totalprice), 2) AS total,
       CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
       CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over (status, priority) with grouping indicators."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
    )


@register(
    "approx_distinct_orders",
    covers="A5 + approximate-aggregate extension (SURVEY §2.4: no approximates "
    "in reference; HLL++ exposed here with an in-query tolerance assertion)",
    oracle="""
SELECT o_orderstatus,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       true AS approx_within_5pct
FROM orders GROUP BY o_orderstatus
""",
)
def approx_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct + a deterministic assertion that HLL++ lands
    within 5% of it — the oracle pins the exact value and expects the
    assertion to hold, so an approx-sketch regression hash-mismatches."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_customers"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", rsd=0.02)
                - F.countDistinct("o_custkey")
            )
            / F.countDistinct("o_custkey")
            < 0.05
        ).alias("approx_within_5pct"),
    )


@register(
    "props_json_extract",
    covers="F9,S10 + JSON extension (crawl.py:156-158 structured-param parsing "
    "-> typed extraction from the events props JSON column)",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod10
FROM events
WHERE props IS NOT NULL
""",
)
def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON extraction from the events props column — the
    parse_qs/structured-config shape on engine-native data (from_json
    with an explicit schema, never schema inference)."""
    ev = load(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    parsed = F.from_json("props", "struct<k:bigint>")
    return ev.select(
        "event_id",
        parsed["k"].alias("k"),
        (parsed["k"] % 10).alias("k_mod10"),
    )
