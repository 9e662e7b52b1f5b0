"""Relational query inventory over the star schema.

Each query exercises one or more SURVEY §2 operator families (the
``covers`` field cites which) re-expressed as idiomatic DataFrame
code, with an equivalent ANSI SQL oracle for DuckDB.

Conventions shared with the oracles (the driver hash-compares values):
  * every computed column is aliased identically on both sides;
  * double aggregates are rounded in-query (2dp money, 4dp ratios) so
    engine-level summation-order drift cannot flip the hash;
  * computed integers are cast to BIGINT on both sides;
  * timestamps are emitted as 'yyyy-MM-dd' strings (session TZ pinned
    to UTC via ensure_utc).

Scale notes are inline: each query's plan is the one we'd want on a
1000-executor cluster (broadcast dims, partial aggs, pushed filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from palegislature_spark.catalog import load
from palegislature_spark.queries.registry import register
from palegislature_spark.session import ensure_utc

# --------------------------------------------------------------------------
# Aggregation pipelines (A1/A3/A10; reference dump.py + pa_legislature.py:52-93)
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    covers="A1,A3,A10,P4 (pa_legislature.py:52-93 status aggregation shape)",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(sum(l_quantity), 2) / count(*)                             AS avg_qty,
       round(sum(l_extendedprice), 2) / count(*)                        AS avg_price,
       round(sum(l_discount), 2) / count(*)                             AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with partial+final agg.

    Scale: single shuffle on 2 low-cardinality keys; map-side combine
    reduces ~everything before the exchange. Filter + 7-column pruning
    push to the parquet scan.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            # House style for averages: round the SUM (absorbs
            # summation-order drift), then divide without re-rounding
            # — identical doubles in, bit-identical double out. A
            # final round() after exact division can flip on
            # exact-half decimals because engines disagree on whether
            # to round the binary value or its shortest decimal repr.
            (F.round(F.sum("l_quantity"), 2) / F.count(F.lit(1))).alias("avg_qty"),
            (F.round(F.sum("l_extendedprice"), 2) / F.count(F.lit(1))).alias("avg_price"),
            (F.round(F.sum("l_discount"), 2) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_top_orders",
    covers="J1,J3,W1,W2 (top-k after multi-join; dump.py:72-78 ordered export shape)",
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority shape: broadcast dim join -> agg -> top-k.

    Scale: customer (filtered) broadcasts; orders⨝lineitem shuffles on
    orderkey once; the ordered LIMIT becomes TakeOrderedAndProject (no
    global sort).
    """
    ensure_utc(spark)
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    covers="J1,J2,J3 (snowflake multi-join, all dims broadcast; match_names year bucketing shape)",
    oracle="""
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier-volume shape: 6-table snowflake join.

    Scale: region/nation/supplier/customer all broadcast (each << the
    64 MB threshold even at sf100); the only shuffle is
    orders⨝lineitem on orderkey + the final 25-key agg.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Filters / projections (P1-P6; crawl.py work-queue scans)
# --------------------------------------------------------------------------


@register(
    "filter_compound",
    covers="P1,P2,P4,P5,P6 (crawl.py:658-659,713 compound work-queue predicates)",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_size
FROM part
WHERE p_type = 'ECONOMY'
  AND p_size BETWEEN 10 AND 30
  AND (p_name LIKE '%gear%' OR p_name LIKE 'small%')
""",
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality + range + LIKE + OR compound predicate, projected scan.

    Scale: all four predicates push to the parquet reader
    (PushedFilters); ReadSchema holds only the 5 referenced columns.
    """
    p = load(spark, sf_dir, "part")
    return p.filter(
        (F.col("p_type") == "ECONOMY")
        & F.col("p_size").between(10, 30)
        & (F.col("p_name").like("%gear%") | F.col("p_name").startswith("small"))
    ).select("p_partkey", "p_name", "p_brand", "p_size")


@register(
    "filter_null_coalesce",
    covers="P3,F10 (crawl.py:658 IS NULL work queue; dump.py:54-57 stamp fallback)",
    oracle="""
SELECT l_orderkey, l_linenumber,
       coalesce(nullif(l_returnflag, 'N'), 'none') AS rf,
       CASE WHEN l_discount = 0 THEN NULL ELSE round(l_discount, 2) END AS disc_or_null,
       count(*) OVER () AS total
FROM lineitem
WHERE l_quantity >= 45
""",
)
def filter_null_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-generating and NULL-resolving expressions (nullif/coalesce).

    Scale: the grand total is an aggregate attached via a broadcast
    1-row crossJoin (same pattern as queries/corpus.py mixture stats),
    NOT ``count(*) OVER ()`` — an unpartitioned window would funnel
    every filtered row through a single WindowExec task at 100 TB.
    """
    li = load(spark, sf_dir, "lineitem")
    filtered = li.filter(F.col("l_quantity") >= 45)
    total = filtered.agg(F.count(F.lit(1)).alias("total"))
    return filtered.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias("rf"),
        F.when(F.col("l_discount") == 0, F.lit(None)).otherwise(F.round("l_discount", 2)).alias("disc_or_null"),
    ).crossJoin(F.broadcast(total))


# --------------------------------------------------------------------------
# Aggregation variants (A2,A4,A5,A6,A9,A10)
# --------------------------------------------------------------------------


@register(
    "group_having",
    covers="A2 (find_duplicates.py:62-64 dob HAVING count>1)",
    oracle="""
SELECT o_custkey, count(*) AS n_orders
FROM orders GROUP BY o_custkey HAVING count(*) > 12
""",
)
def group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING — the duplicate-blocking scan of §2.4 A2."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 12)
    )


@register(
    "distinct_flags",
    covers="A5 (match_names.py:85 distinct scan)",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@register(
    "customer_topk_spend",
    covers="A6,W2 (crawl.py:676 ORDER BY..LIMIT max; top-k export)",
    oracle="""
SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend, count(*) AS n_orders
FROM orders GROUP BY o_custkey
ORDER BY total_spend DESC, o_custkey LIMIT 10
""",
)
def topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-limit top-k -> TakeOrderedAndProject, no global sort."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("total_spend").desc(), F.col("o_custkey"))
        .limit(10)
    )


@register(
    "agg_conditional_status",
    covers="A4,A10 (pa_legislature.py:82-93 derived status; match_names.py:163 pct)",
    oracle="""
SELECT o_orderpriority,
       count(*)                                                  AS n_orders,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_done,
       CAST(((10000 * sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)) // count(*)) / 100.0 AS DOUBLE) AS pct_open
FROM orders GROUP BY o_orderpriority
""",
)
def agg_conditional_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional counts + ratio — the crawl-status report shape.

    pct_open (hundredths of a percent) is derived entirely in INTEGER
    space — ``(10000 * n_open) div n`` — then divided by 100.0.  Both
    engines do one exact integer division and one IEEE double division
    by 100.0, which is bit-identical everywhere.  Earlier rounds used
    ``round(double, 2)`` on both sides, but round() semantics differ
    between engines AND between DuckDB versions (exact-decimal HALF_UP
    vs scaled std::round), which made the driver's hash comparison
    version-dependent (r1/r2 mismatch).  Integer arithmetic removes the
    ambiguity entirely.
    """
    o = load(spark, sf_dir, "orders")
    n_open = F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            n_open.alias("n_open"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_done"),
        )
        .withColumn(
            "pct_open", F.expr("(10000 * n_open) div n_orders") / F.lit(100.0)
        )
    )


@register(
    "agg_bool_any",
    covers="A9 (dump.py:51 any(missing stamp); match_names.py:113-117 all-members flag)",
    oracle="""
SELECT o_custkey,
       CAST(max(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT) AS has_big_order,
       CAST(min(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)   AS all_done
FROM orders GROUP BY o_custkey
""",
)
def agg_bool_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANY/ALL-style boolean aggregation via max/min of indicator."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max(F.when(F.col("o_totalprice") > 300000, 1).otherwise(0)).cast("long").alias("has_big_order"),
        F.min(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).cast("long").alias("all_done"),
    )


@register(
    "agg_count_distinct",
    covers="A5 (distinct cardinalities per group)",
    oracle="""
SELECT c_mktsegment,
       count(DISTINCT c_nationkey) AS n_nations,
       count(*)                    AS n_customers,
       round(sum(c_acctbal), 2) / count(*) AS avg_bal
FROM customer GROUP BY c_mktsegment
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
        (F.round(F.sum("c_acctbal"), 2) / F.count(F.lit(1))).alias("avg_bal"),
    )


@register(
    "agg_collect_sorted",
    covers="A8 (match_names.py:80-83 votes-per-roll grouping, as deterministic list)",
    oracle="""
SELECT o_custkey,
       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
       count(*) AS n_orders
FROM orders GROUP BY o_custkey
""",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set made deterministic via sort + join (hashable output)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "rollup_revenue",
    covers="A3 + rollup extension (SURVEY §2.4 'cube/rollup become available')",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_extendedprice), 2) AS total_price,
       count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP (superset of the reference's A3)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "total_price",
            "n",
        )
    )


# --------------------------------------------------------------------------
# Pivot (A7 — the dump.py:90-101 matrix build)
# --------------------------------------------------------------------------


@register(
    "pivot_status",
    covers="A7,S9 (dump.py:90-101 vote-matrix pivot, explicit value list per §4.3.4)",
    oracle="""
SELECT o_orderpriority,
       round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
       round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
FROM orders GROUP BY o_orderpriority
""",
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit values list.

    Scale: the explicit list skips Spark's extra distinct-scan job and
    keeps the pivot a single shuffle — exactly the §4.3.4 discipline
    the 206-column vote matrix needs.
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )


# --------------------------------------------------------------------------
# Joins (J1,J10,SO3 anti/semi; J8 interval)
# --------------------------------------------------------------------------


@register(
    "anti_join_customers",
    covers="J10,SO1 (match_names.py:132-133 unmatched-set difference)",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders — left_anti join (NOT EXISTS)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "semi_join_segments",
    covers="SO3,P8 (dump.py:17 membership gate; match_names.py:93 fully_crawled gate)",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers_with_urgent
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
GROUP BY c_mktsegment
""",
)
def semi_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS gate -> left_semi join, then aggregate."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_with_urgent"))
    )


@register(
    "interval_join_fast_ship",
    covers="J8,P4 (apply_edits.py:63-73 stamp-window interval join)",
    oracle="""
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       count(*)                       AS n_fast_lines,
       round(sum(l_extendedprice), 2) AS fast_revenue
FROM orders
JOIN lineitem
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate <  o_orderdate + INTERVAL 30 DAY
GROUP BY strftime(o_orderdate, '%Y-%m')
""",
)
def interval_join_fast_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key + time-interval join (the edits.yaml windowed-rule shape).

    Scale: the equi key (orderkey) carries the shuffle; the interval
    predicate evaluates post-join, so no O(n^2) range explosion.
    """
    ensure_utc(spark)
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_fast_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("fast_revenue"),
        )
    )


# --------------------------------------------------------------------------
# Windows (W1-W5)
# --------------------------------------------------------------------------


@register(
    "first_order_window",
    covers="W5 (crawl.py:676 first-after-order; match_names.py:45-47 unique-candidate)",
    oracle="""
SELECT o_custkey, o_orderkey AS first_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS first_date
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1
""",
)
def window_first_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match-per-group via row_number window."""
    ensure_utc(spark)
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("first_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("first_date"),
        )
    )


@register(
    "analytic_running_total",
    covers="W1,W3 + analytic extension (SURVEY §2.5: full window surface)",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
FROM orders
""",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per customer (deterministic order => stable rounding)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "lag_gap_window",
    covers="W1 + lag extension (apply_edits.py:36-49 year±1 neighbor as lag/lead)",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day',
         lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
         o_orderdate) AS BIGINT) AS days_since_prev
FROM orders
""",
)
def window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() neighbor access — the temporal-neighbor join J9 as a window."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("days_since_prev"),
    )


# --------------------------------------------------------------------------
# Set operations (SO1,SO2)
# --------------------------------------------------------------------------


@register(
    "setops_status",
    covers="SO1,SO2 (match_names.py:132-133,192 set difference + union report)",
    oracle="""
SELECT o_custkey, 'only_open' AS tag FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
UNION ALL
SELECT o_custkey, 'both' AS tag FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
""",
)
def setops_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT / INTERSECT / UNION ALL over keyed sets."""
    o = load(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    done_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    only_open = open_c.subtract(done_c).select("o_custkey", F.lit("only_open").alias("tag"))
    both = open_c.intersect(done_c).select("o_custkey", F.lit("both").alias("tag"))
    return only_open.unionAll(both)


# --------------------------------------------------------------------------
# Scalar functions (F3,F5,F6,F8)
# --------------------------------------------------------------------------


@register(
    "cleanup_string_funcs",
    covers="F3,F8 (crawl.py:369-375 regex extract; crawl.py:106-107 cleanup)",
    oracle="""
SELECT p_partkey,
       CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS BIGINT) AS brand_num,
       lower(p_type)                                   AS type_lc,
       upper(p_name)                                   AS name_uc,
       substr(p_name, 1, 5)                            AS name_head,
       CAST(length(p_name) AS BIGINT)                  AS name_len,
       replace(p_name, ' ', '_')                       AS name_snake,
       trim(concat(p_type, ' ', p_brand))              AS type_brand
FROM part
""",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction + case/trim/replace cleanup — all JVM-side."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("long").alias("brand_num"),
        F.lower("p_type").alias("type_lc"),
        F.upper("p_name").alias("name_uc"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.trim(F.concat_ws(" ", "p_type", "p_brand")).alias("type_brand"),
    )


@register(
    "datetime_funcs",
    covers="F5 (crawl.py:102-103,130,215 date parse/format)",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT)    AS order_year,
       CAST(month(o_orderdate) AS BIGINT)   AS order_month,
       CAST(dayofweek(o_orderdate) AS BIGINT) AS order_dow,
       strftime(o_orderdate, '%Y-%m')       AS order_ym,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
""",
)
def datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime extraction/arithmetic/formatting (UTC-pinned)."""
    ensure_utc(spark)
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        # DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1.
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("order_dow"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
    )


@register(
    "expand_year_ranges",
    covers="F6 (crawl.py:333-342 parse_year_range -> sequence+explode)",
    oracle="""
SELECT o_custkey AS custkey, CAST(unnest(generate_series(y0, y1)) AS BIGINT) AS year
FROM (
  SELECT o_custkey,
         CAST(min(year(o_orderdate)) AS BIGINT) AS y0,
         CAST(max(year(o_orderdate)) AS BIGINT) AS y1
  FROM orders GROUP BY o_custkey
)
""",
)
def year_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-range expansion: sequence() + explode (reference F6)."""
    o = load(spark, sf_dir, "orders")
    spans = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.min(F.year("o_orderdate")).cast("long").alias("y0"),
        F.max(F.year("o_orderdate")).cast("long").alias("y1"),
    )
    return spans.select(
        "custkey", F.explode(F.sequence("y0", "y1")).alias("year")
    )


@register(
    "constraint_quality_audit",
    covers="training-pipeline extension: declarative data-quality "
    "audit (Deequ-style constraint suite) — all row-local checks "
    "fused into ONE aggregate scan, key-uniqueness in the same pass, "
    "referential integrity as a LEFT ANTI join; violations-as-data "
    "(reference parity: apply_edits.py validation pass, "
    "crawl.py:678 completeness gate)",
    oracle="""
WITH scalar AS (
  SELECT
    CAST(count(*) AS BIGINT) AS total,
    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_complete,
    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS v_domain,
    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v_unique
  FROM orders
),
fk AS (
  SELECT CAST(count(*) AS BIGINT) AS total,
         CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS violations
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_orderkey IS NOT NULL
),
long_fmt AS (
  SELECT 'orders.custkey_complete' AS "constraint", v_complete AS violations, total FROM scalar
  UNION ALL
  SELECT 'orders.status_domain', v_domain, total FROM scalar
  UNION ALL
  SELECT 'orders.totalprice_positive', v_range, total FROM scalar
  UNION ALL
  SELECT 'orders.orderkey_unique', v_unique, total FROM scalar
  UNION ALL
  SELECT 'lineitem.orderkey_fk', violations, total FROM fk
)
SELECT "constraint", violations, total, violations = 0 AS passed
FROM long_fmt ORDER BY "constraint"
""",
)
def constraint_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate a batch on a declared constraint suite: completeness,
    value domain, range, key uniqueness (orders), plus lineitem ->
    orders referential integrity. The four orders-side checks cost
    ONE scan (operators/audit.py fuses them into a single aggregate);
    the FK check is the only second relation touched.
    """
    from palegislature_spark.operators import audit

    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    scalar = audit.audit_scalar(
        o,
        [
            audit.Violation("orders.custkey_complete", F.col("o_custkey").isNull()),
            audit.Violation(
                "orders.status_domain", ~F.col("o_orderstatus").isin("O", "F", "P")
            ),
            audit.Violation("orders.totalprice_positive", F.col("o_totalprice") <= 0),
        ],
        unique_keys={"orders.orderkey_unique": ["o_orderkey"]},
    )
    fk = audit.audit_foreign_key(
        "lineitem.orderkey_fk", li, "l_orderkey", o, "o_orderkey"
    )
    return audit.audit_union(scalar, fk)


@register(
    "audit_category_drift",
    covers="training-pipeline extension: batch-over-batch categorical "
    "drift report (ingest-gate distribution-shift alarm) — columns "
    "melted row-locally, ONE map-side-combined (column, category) "
    "aggregate, shares as single long/long divisions; engine-exact",
    oracle="""
WITH melted AS (
  SELECT year(o_orderdate) >= 1997 AS cur,
         'o_orderstatus' AS "column", o_orderstatus AS category
  FROM orders
  UNION ALL
  SELECT year(o_orderdate) >= 1997, 'o_orderpriority', o_orderpriority
  FROM orders
),
counts AS (
  SELECT "column", category,
         CAST(sum(CASE WHEN NOT cur THEN 1 ELSE 0 END) AS BIGINT) AS n_prev,
         CAST(sum(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM melted GROUP BY 1, 2
),
shares AS (
  SELECT "column", category, n_prev, n_cur,
         n_prev / CAST(sum(n_prev) OVER (PARTITION BY "column") AS DOUBLE)
           AS prev_share,
         n_cur / CAST(sum(n_cur) OVER (PARTITION BY "column") AS DOUBLE)
           AS cur_share
  FROM counts
)
SELECT "column", category, n_prev, n_cur, prev_share, cur_share,
       abs(cur_share - prev_share) > 0.005 AS drifted
FROM shares
""",
)
def audit_category_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift gate between dataset refreshes: orders before
    1997 play the previous batch, 1997+ the current one; per-category
    shares of o_orderstatus / o_orderpriority are compared at a
    half-point threshold (the synthetic generator draws both columns
    uniformly, so only sampling-level shifts exist; planted real drift
    is exercised in tests/test_audit.py). One scan of orders; the
    share windows run over the (column, category)-sized counts table.
    """
    from palegislature_spark.operators import audit

    o = load(spark, sf_dir, "orders")
    return audit.category_drift(
        o,
        F.year("o_orderdate") >= 1997,
        ["o_orderstatus", "o_orderpriority"],
        threshold=0.005,
    )


@register(
    "audit_numeric_drift",
    covers="training-pipeline extension: batch-over-batch NUMERIC "
    "distribution-shift gate — fixed-histogram binning (row-local "
    "melt, one map-side-combined aggregate) + binned "
    "Kolmogorov-Smirnov statistic; the sup stays in DECIMAL(38,0) "
    "integer cross-products and the drift decision is an integer "
    "inequality, so the report is engine-exact (KS chosen over PSI "
    "precisely because PSI's float log-sum is accumulation-order-"
    "dependent)",
    oracle="""
WITH melted AS (
  SELECT year(o_orderdate) >= 1997 AS cur, 'o_custkey' AS "column",
         CASE WHEN o_custkey IS NULL OR isnan(CAST(o_custkey AS DOUBLE)) THEN -1
              ELSE CAST(least(greatest(floor((CAST(o_custkey AS DOUBLE) - 0.0) / 100000.0), 0), 19) AS INT)
         END AS bin
  FROM orders
  UNION ALL
  SELECT year(o_orderdate) >= 1997, 'o_totalprice',
         CASE WHEN o_totalprice IS NULL OR isnan(CAST(o_totalprice AS DOUBLE)) THEN -1
              ELSE CAST(least(greatest(floor((CAST(o_totalprice AS DOUBLE) - 0.0) / 20000.0), 0), 24) AS INT)
         END
  FROM orders
),
counts AS (
  SELECT "column", bin,
         CAST(sum(CASE WHEN NOT cur THEN 1 ELSE 0 END) AS BIGINT) AS n_prev,
         CAST(sum(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM melted GROUP BY 1, 2
),
cum AS (
  SELECT "column", n_prev, n_cur,
         sum(n_prev) OVER (PARTITION BY "column" ORDER BY bin) AS cum_prev,
         sum(n_cur) OVER (PARTITION BY "column" ORDER BY bin) AS cum_cur,
         sum(n_prev) OVER (PARTITION BY "column") AS tp,
         sum(n_cur) OVER (PARTITION BY "column") AS tc
  FROM counts
),
ks AS (
  SELECT "column",
         max(abs(CAST(cum_prev AS DECIMAL(38,0)) * tc
                 - CAST(cum_cur AS DECIMAL(38,0)) * tp)) AS max_num,
         max(tp) AS tp, max(tc) AS tc
  FROM cum GROUP BY 1
)
SELECT "column",
       CAST(tp AS BIGINT) AS total_prev,
       CAST(tc AS BIGINT) AS total_cur,
       CASE WHEN tp = 0 OR tc = 0
            THEN CASE WHEN tp <> tc THEN 1.0 ELSE 0.0 END
            ELSE CAST(max_num AS DOUBLE) / (CAST(tp AS DOUBLE) * CAST(tc AS DOUBLE))
       END AS ks_stat,
       CASE WHEN tp = 0 OR tc = 0 THEN tp <> tc
            ELSE max_num * 1000 > CAST(tp AS DECIMAL(38,0)) * tc * 30
       END AS drifted
FROM ks
""",
)
def audit_numeric_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric twin of ``audit_category_drift``: orders before 1997
    play the previous batch, 1997+ the current one; o_totalprice
    (25 x 20k histogram) and o_custkey (20 x 100k — id-shaped, piles
    into low bins and clamps at replica scale, a deliberately stable
    column) are compared with the binned KS statistic at a 0.030
    threshold. The generator draws both uniformly over time, so only
    sampling-level shift exists here; planted real drift (and the
    NULL-bin / empty-batch edges) is exercised in tests/test_audit.py.
    One scan of orders; everything after the (column, bin) aggregate
    is histogram-sized.
    """
    from palegislature_spark.operators import audit

    o = load(spark, sf_dir, "orders")
    return audit.numeric_drift(
        o,
        F.year("o_orderdate") >= 1997,
        {
            "o_custkey": (0.0, 2_000_000.0, 20),
            "o_totalprice": (0.0, 500_000.0, 25),
        },
        threshold_milli=30,
    )
