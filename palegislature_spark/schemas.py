"""Explicit schema registry — the Spark analogue of the reference's
YAML-declared schema (``/root/reference/pa_legislature.yaml:1-71``).

Schemas are declared in code and never inferred; loaders apply them
with ``spark.read.schema(...)`` where the source format allows, and
validate parquet footers otherwise.

Two families:
  * the legislative snowflake (7 tables, SURVEY §1.1)
  * the driver star schema + extension tables (TESTDATA.md)
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Legislative snowflake (reference: pa_legislature.yaml:1-71)
# --------------------------------------------------------------------------

SESSIONS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("chamber", T.IntegerType(), False),  # 1=HOUSE 2=SENATE
        T.StructField("year", T.IntegerType(), False),
        T.StructField("session_index", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("last_crawl", T.TimestampType(), True),
    ]
)

SESSION_DAYS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("session_id", T.LongType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("last_crawl", T.TimestampType(), True),
    ]
)

ROLL_CALLS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("day_id", T.LongType(), False),
        T.StructField("session_year", T.IntegerType(), False),
        T.StructField("session_index", T.IntegerType(), False),
        T.StructField("chamber", T.IntegerType(), False),
        T.StructField("number", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        # Nullable: some reference pages lack a time (crawl.py:212-218);
        # export ordering falls back to day date + id (dump.py:51-58).
        T.StructField("stamp", T.TimestampType(), True),
        T.StructField("last_crawl", T.TimestampType(), True),
    ]
)

VOTES = T.StructType(
    [
        T.StructField("session_id", T.LongType(), False),
        T.StructField("roll_id", T.LongType(), False),
        # Raw scraped voter string — the dirty key (pa_legislature.yaml:27).
        T.StructField("name", T.StringType(), False),
        T.StructField("vote", T.IntegerType(), False),  # 1=Y 2=N 3=X 4=E
        # Null until entity resolution back-fills it (match_names.py:187-188).
        T.StructField("member_id", T.LongType(), True),
    ]
)

MEMBERS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("house_archive_id", T.LongType(), True),
        T.StructField("house_current_id", T.LongType(), True),
        T.StructField("senate_archive_id", T.LongType(), True),
        T.StructField("senate_current_id", T.LongType(), True),
        T.StructField("first", T.StringType(), True),
        T.StructField("middle", T.StringType(), True),
        T.StructField("last", T.StringType(), False),
        T.StructField("suffix", T.StringType(), True),
        T.StructField("dob", T.DateType(), True),
        T.StructField("last_crawl", T.TimestampType(), True),
    ]
)

MEMBER_CRAWL = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("last_crawl", T.TimestampType(), True),
    ]
)

SERVICE = T.StructType(
    [
        T.StructField("member_id", T.LongType(), False),
        T.StructField("year", T.IntegerType(), False),
        T.StructField("chamber", T.IntegerType(), False),
        T.StructField("district", T.IntegerType(), True),
        T.StructField("party", T.StringType(), True),
    ]
)

SNOWFLAKE: dict[str, T.StructType] = {
    "sessions": SESSIONS,
    "session_days": SESSION_DAYS,
    "roll_calls": ROLL_CALLS,
    "votes": VOTES,
    "members": MEMBERS,
    "member_crawl": MEMBER_CRAWL,
    "service": SERVICE,
}

# --------------------------------------------------------------------------
# Driver star schema + extension tables (TESTDATA.md / FIXTURES.md §2)
# --------------------------------------------------------------------------

STAR: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType(), False),
            T.StructField("r_name", T.StringType(), False),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), False),
            T.StructField("n_name", T.StringType(), False),
            T.StructField("n_regionkey", T.IntegerType(), False),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), False),
            T.StructField("c_name", T.StringType(), False),
            T.StructField("c_nationkey", T.IntegerType(), False),
            T.StructField("c_acctbal", T.DoubleType(), False),
            T.StructField("c_mktsegment", T.StringType(), False),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), False),
            T.StructField("s_name", T.StringType(), False),
            T.StructField("s_nationkey", T.IntegerType(), False),
            T.StructField("s_acctbal", T.DoubleType(), False),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType(), False),
            T.StructField("p_name", T.StringType(), False),
            T.StructField("p_brand", T.StringType(), False),
            T.StructField("p_type", T.StringType(), False),
            T.StructField("p_size", T.IntegerType(), False),
            T.StructField("p_retailprice", T.DoubleType(), False),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), False),
            T.StructField("o_custkey", T.LongType(), False),
            T.StructField("o_orderstatus", T.StringType(), False),
            T.StructField("o_totalprice", T.DoubleType(), False),
            T.StructField("o_orderdate", T.TimestampType(), False),
            T.StructField("o_orderpriority", T.StringType(), False),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), False),
            T.StructField("l_partkey", T.LongType(), False),
            T.StructField("l_suppkey", T.LongType(), False),
            T.StructField("l_linenumber", T.IntegerType(), False),
            T.StructField("l_quantity", T.DoubleType(), False),
            T.StructField("l_extendedprice", T.DoubleType(), False),
            T.StructField("l_discount", T.DoubleType(), False),
            T.StructField("l_tax", T.DoubleType(), False),
            T.StructField("l_returnflag", T.StringType(), False),
            T.StructField("l_linestatus", T.StringType(), False),
            T.StructField("l_shipdate", T.TimestampType(), False),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("user_id", T.LongType(), False),
            T.StructField("event_type", T.StringType(), False),
            T.StructField("value", T.DoubleType(), False),
            T.StructField("props", T.StringType(), True),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}
