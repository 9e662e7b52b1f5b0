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
    "analytic_rank_funcs",
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


_NAMES_FIXTURE = [
    "SMITH",
    "WHITE, MARY JO",
    "KELLER, M. K.",
    "VAN WYK, PETER",
    "DOE, JANE III",
    "John Smith Jr.",
    "F. Scott Fitzgerald",
    "COOK-ARTIS, MARIA",
]
_NAMES_VALUES = ", ".join(f"('{n}')" for n in _NAMES_FIXTURE)

# The oracle restates python_title word-wise: lower the string, then
# upper the first char of each space-separated word AND of each
# hyphen part (the `retitled` CTE) — equivalent to the char-fold for
# alpha/space/hyphen/dot inputs, which is the fixture's domain.
_NAME_PARSE_ORACLE = f"""
WITH raw(name) AS (VALUES {_NAMES_VALUES}),
titled AS (
  SELECT name,
    CASE WHEN NOT regexp_matches(name, '[a-z]') THEN
      array_to_string(list_transform(string_split(lower(name), ' '),
        w -> CASE WHEN len(w) = 0 THEN w
                  ELSE upper(w[1]) ||
                       array_to_string(list_transform(string_split(w[2:], '-'),
                         p -> CASE WHEN len(p) = 0 THEN p ELSE p END), '-')
             END), ' ')
    ELSE name END AS t
  FROM raw
),
retitled AS (
  -- python title() also capitalizes after '-': redo per hyphen part
  SELECT name,
    CASE WHEN NOT regexp_matches(name, '[a-z]') THEN
      array_to_string(list_transform(string_split(t, '-'),
        p -> CASE WHEN len(p) = 0 THEN p ELSE upper(p[1]) || p[2:] END), '-')
    ELSE t END AS t
  FROM titled
),
parsed AS (
  SELECT name,
    CASE WHEN position(',' IN t) > 0 THEN trim(split_part(t, ',', 1))
         ELSE NULL END AS comma_last,
    CASE WHEN position(',' IN t) > 0 THEN trim(split_part(t, ',', 2))
         ELSE t END AS rest
  FROM retitled
),
toks AS (
  SELECT name, comma_last, string_split(rest, ' ') AS tk FROM parsed
),
sfx AS (
  SELECT name, comma_last, tk,
    CASE WHEN len(tk) > 1 AND lower(tk[-1]) IN
              ('jr','jr.','sr','sr.','ii','iii','iv','v')
         THEN tk[-1] ELSE NULL END AS suffix
  FROM toks
),
body AS (
  SELECT name, comma_last, suffix,
    CASE WHEN suffix IS NOT NULL THEN tk[1:len(tk)-1] ELSE tk END AS b
  FROM sfx
)
SELECT name,
  CASE WHEN comma_last IS NOT NULL THEN nullif(b[1], '')
       WHEN len(b) > 1 THEN b[1] ELSE NULL END AS first,
  CASE WHEN comma_last IS NOT NULL AND len(b) >= 2
         THEN array_to_string(b[2:], ' ')
       WHEN comma_last IS NULL AND len(b) > 2
         THEN array_to_string(b[2:len(b)-1], ' ')
       ELSE NULL END AS middle,
  COALESCE(comma_last, b[-1]) AS last,
  suffix
FROM body
"""


@register(
    "name_parse_normalize",
    covers="F1,F2 (crawl.py:223-261 advanced_decapitalization + name parsing "
    "to struct; char-fold title semantics vs word-wise SQL restatement)",
    oracle=_NAME_PARSE_ORACLE,
)
def name_parse_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Title-normalize and parse the fixture names to components."""
    from palegislature_spark.functions import parse_name, python_title

    raw = spark.createDataFrame([(n,) for n in _NAMES_FIXTURE], "name string")
    titled = F.when(
        ~F.col("name").rlike("[a-z]"), python_title(F.col("name"))
    ).otherwise(F.col("name"))
    parsed = parse_name(titled)
    return raw.select(
        "name",
        parsed["first"].alias("first"),
        parsed["middle"].alias("middle"),
        parsed["last"].alias("last"),
        parsed["suffix"].alias("suffix"),
    )


@register(
    "agg_stat_quantiles",
    covers="A-family extension: quantile sketch (Greenwald-Khanna approx_percentile "
    "pinned exact at accuracy >> n, cross-checked against DuckDB quantile_disc/cont)",
    oracle="""
SELECT o_orderpriority,
       quantile_disc(o_totalprice, 0.25)  AS p25,
       quantile_disc(o_totalprice, 0.5)   AS p50,
       quantile_disc(o_totalprice, 0.9)   AS p90,
       quantile_cont(o_totalprice, 0.5)   AS median_cont
FROM orders GROUP BY o_orderpriority
""",
)
def stat_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution summary per priority via the GK quantile sketch.

    approx_percentile IS the scale path (mergeable sketch, one pass,
    no sort): at accuracy 1e6 >> group size the sketch answer is the
    exact rank element, which is what makes the DuckDB oracle an
    exact cross-check rather than a tolerance band.  percentile()
    (continuous interpolation) doubles as the exact-agreement check
    on the interpolating definition.
    """
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("approx_percentile(o_totalprice, 0.25, 1000000)").alias("p25"),
        F.expr("approx_percentile(o_totalprice, 0.5, 1000000)").alias("p50"),
        F.expr("approx_percentile(o_totalprice, 0.9, 1000000)").alias("p90"),
        F.expr("percentile(o_totalprice, 0.5)").alias("median_cont"),
    )
