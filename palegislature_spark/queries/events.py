"""Event-stream queries: sessionization, as-of joins, time windows.

These run the streaming operator surface in batch mode (F.window /
F.session_window work identically over batch DataFrames), so the
driver's DuckDB oracle can validate the window semantics; the
streaming execution of the same operators lives in
palegislature_spark/streaming/ with its own tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from palegislature_spark.catalog import load
from palegislature_spark.operators.asof import asof_join
from palegislature_spark.operators.islands import date_islands
from palegislature_spark.queries.registry import register
from palegislature_spark.session import ensure_utc

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@register(
    "islands_user_days",
    covers="W4,F7 (crawl.py:509-530 condense(): gaps-and-islands over active days)",
    oracle="""
WITH dd AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
r AS (
  SELECT user_id, d,
         row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
  FROM dd
)
SELECT user_id,
       strftime(min(d), '%Y-%m-%d') AS island_start,
       strftime(max(d), '%Y-%m-%d') AS island_end,
       count(*) AS n_days
FROM r GROUP BY user_id, d - CAST(rn AS INTEGER)
""",
)
def islands_user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-active-day runs per user (the condense() shape)."""
    ensure_utc(spark)
    ev = load(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("d"))
    runs = date_islands(ev, ["user_id"], "d")
    return runs.select(
        "user_id",
        F.date_format("island_start", "yyyy-MM-dd").alias("island_start"),
        F.date_format("island_end", "yyyy-MM-dd").alias("island_end"),
        "n_days",
    )


@register(
    "asof_click_purchase",
    covers="J8 (apply_edits.py:63-73 as-of window semantics, DuckDB ASOF oracle)",
    oracle=f"""
WITH purchases AS (
  SELECT user_id, ts, max(event_id) AS purchase_id
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT c.event_id AS click_id, c.user_id,
       strftime(c.ts, '{TS_FMT_DUCK}') AS click_ts,
       p.purchase_id
FROM clicks c
ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts >= p.ts
""",
)
def asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each click, the user's most recent purchase at-or-before it."""
    ensure_utc(spark)
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        ts="ts",
        right_payload=["purchase_id"],
        tiebreak="purchase_id",
    )
    return joined.select(
        "click_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("click_ts"),
        "purchase_id",
    )


@register(
    "events_tumbling_hourly",
    covers="streaming §2.10 (tumbling window agg, batch-checked)",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
""",
)
def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregation (F.window, epoch-aligned)."""
    ensure_utc(spark)
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "events_sliding_windows",
    covers="streaming §2.10 (sliding window agg, batch-checked)",
    oracle="""
WITH slid AS (
  SELECT date_trunc('hour', ts) AS ws, value FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, value FROM events
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n_events,
       round(sum(value), 2) / count(*) AS avg_value
FROM slid GROUP BY ws
""",
)
def sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour window sliding by 1 hour — each event lands in 2 windows."""
    ensure_utc(spark)
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # Round the sum (normalizes summation-order drift), then
            # divide WITHOUT re-rounding: the division of identical
            # doubles is bit-identical, while a final round() can flip
            # on exact-half decimals (Spark rounds the shortest string
            # repr, other engines round the binary value).
            (F.round(F.sum("value"), 2) / F.count(F.lit(1))).alias("avg_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "avg_value",
        )
    )


@register(
    "session_windows",
    covers="streaming §2.10 + W4 (session_window; oracle = lag-gap islands SQL)",
    oracle=f"""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 4 HOUR OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
)
SELECT user_id,
       strftime(min(ts), '{TS_FMT_DUCK}') AS session_start,
       strftime(max(ts), '{TS_FMT_DUCK}') AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, session_id
""",
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (4h inactivity gap) via F.session_window."""
    ensure_utc(spark)
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "4 hours").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("s0"),
            F.max("ts").alias("s1"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.date_format("s0", TS_FMT_SPARK).alias("session_start"),
            F.date_format("s1", TS_FMT_SPARK).alias("session_end"),
            "n_events",
        )
    )


@register(
    "dedup_events_window",
    covers="streaming §2.10 dropDuplicates shape + W5 (first event per user-hour)",
    oracle="""
SELECT user_id,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       min(event_id) AS first_event_id,
       count(*) AS n_dropped
FROM events GROUP BY 1, 2
""",
)
def dedup_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed dedup: keep one event per (user, hour) — the batch
    equivalent of dropDuplicates within a watermark."""
    ensure_utc(spark)
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.window("ts", "1 hour").alias("w")
        )
        .agg(
            F.min("event_id").alias("first_event_id"),
            F.count(F.lit(1)).alias("n_dropped"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "first_event_id",
            "n_dropped",
        )
    )


@register(
    "cdc_value_transitions",
    covers="streaming §2.10 custom stateful operator (applyInPandasWithState "
    "CDC-style change detection; batch-checked via its lag-window "
    "equivalent — the real-stream form with cross-micro-batch state and "
    "event-time TTL is exercised in tests/test_streaming.py)",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id, value,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
  FROM events
)
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value, prev_value
FROM seq WHERE prev_value IS NULL OR value <> prev_value
""",
)
def value_transitions_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows where a user's value CHANGES from its previous event —
    the batch lag-window equivalent of streaming.value_transitions
    (a reverted value re-emits, which plain dedup cannot express)."""
    from pyspark.sql.window import Window

    ensure_utc(spark)
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_value", F.lag("value").over(w))
    return (
        seq.filter(
            F.col("prev_value").isNull() | (F.col("value") != F.col("prev_value"))
        )
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "value",
            "prev_value",
        )
    )


@register(
    "conversion_funnel_stages",
    covers="analytics extension: ordered funnel analysis "
    "(view -> click -> purchase with strict event-time ordering per "
    "user — the MATCH_RECOGNIZE-lite conversion query every product "
    "analytics store ships; three keyed aggregation passes, no "
    "self-cartesian)",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.v_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
  GROUP BY e.user_id
)
SELECT v.user_id,
       CASE WHEN p.p_ts IS NOT NULL THEN 'purchase'
            WHEN c.c_ts IS NOT NULL THEN 'click'
            ELSE 'view' END AS stage,
       p.p_ts IS NOT NULL AS converted,
       CASE WHEN p.p_ts IS NOT NULL
            THEN epoch_ms(p.p_ts) - epoch_ms(v.v_ts) END AS ms_to_convert
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
""",
)
def conversion_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel: first view, first click AFTER that view,
    first purchase AFTER that click. Each stage is one keyed
    aggregation over the events pre-filtered to the stage type — the
    standard funnel plan (events shuffle on user_id once per stage;
    the stage tables are user-count-sized and co-partitioned, so
    Catalyst reuses the exchange). ms_to_convert stays integer
    (epoch millis difference), engine-exact."""
    ensure_utc(spark)
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.when(F.col("p_ts").isNotNull(), "purchase")
            .when(F.col("c_ts").isNotNull(), "click")
            .otherwise("view")
            .alias("stage"),
            F.col("p_ts").isNotNull().alias("converted"),
            # events.ts loads as TIMESTAMP_NTZ; cast under the pinned
            # UTC session so unix_millis accepts it — same instants
            # DuckDB's epoch_ms reads off the naive timestamp
            F.when(
                F.col("p_ts").isNotNull(),
                F.unix_millis(F.col("p_ts").cast("timestamp"))
                - F.unix_millis(F.col("v_ts").cast("timestamp")),
            ).alias("ms_to_convert"),
        )
    )


@register(
    "cohort_retention",
    covers="analytics extension: cohort retention triangle (users "
    "grouped by first-seen day; distinct active users at each day "
    "offset — two keyed aggregations, integer-exact)",
    oracle="""
WITH first_seen AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day FROM events
  GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
  FROM events e JOIN first_seen f ON e.user_id = f.user_id
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(day_offset AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS active_users
FROM activity GROUP BY 1, 2
""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: cohort = first-seen calendar day; each
    (cohort, day-offset) cell counts the distinct users active that
    many days later. The cohort table is one row per distinct USER —
    it grows with the data, so it is NOT broadcast-hinted: the join
    shuffles on user_id (co-partitioned with the aggregation that
    built it, so Catalyst reuses the exchange), and AQE may still
    choose broadcast when the user set actually fits. Everything else
    is one distinct + one count — exact integer arithmetic."""
    ensure_utc(spark)
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    return activity.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).cast("long").alias("active_users")
    ).select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("day_offset").cast("long").alias("day_offset"),
        "active_users",
    )
