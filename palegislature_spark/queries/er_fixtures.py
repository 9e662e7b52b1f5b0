"""Inline legislative-snowflake fixture for the ER registry queries.

The driver's testdata is the TPC-H-ish star schema; the ER operators
need name-shaped data, so these queries carry a small deterministic
fixture inline (Spark: createDataFrame; DuckDB oracle: VALUES CTEs
rendered by ``values_sql``). Rows mirror tests/snowflake_fixture.py's
dirty cases, restricted to match paths both engines express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from palegislature_spark import schemas

# (id, h_arch, h_cur, s_arch, s_cur, first, middle, last, suffix, dob, last_crawl)
MEMBERS = [
    (1, 11, None, None, None, "Thomas", None, "Smith", None, None, None),
    (2, None, 21, None, None, "Tom", None, "Smith", None, None, None),
    (3, 13, None, None, None, "Mary", "Jo", "White", None, None, None),
    (4, 14, None, None, None, "John", None, "Keller", None, None, None),
    (5, 15, None, None, None, "Mark", "K.", "Keller", None, None, None),
    (6, 16, None, None, None, "Dawn", None, "Krueger-Braneky", None, None, None),
    (7, 17, None, None, None, "Pam", None, "Jones", None, None, None),
    (8, 18, None, None, None, "Paula", None, "Jones", None, None, None),
    # initial-vs-full duplicate pair (merged by the dedup query)
    (9, 19, None, None, None, "J.", None, "Doe", None, None, None),
    (10, None, 110, None, None, "John", None, "Doe", None, None, None),
]

# (member_id, year, chamber, district, party)
SERVICE = [
    (1, 2019, 1, 10, "Republican"),
    (3, 2019, 1, 11, "Democrat"),
    (4, 2019, 1, 12, "Republican"),
    (5, 2019, 1, 13, "Republican"),
    (6, 2019, 1, 14, "Democrat"),
    (7, 2019, 1, 15, "Democrat"),
    (8, 2019, 1, 16, "Democrat"),
    (9, 2019, 1, 17, "Democrat"),
    (10, 2019, 1, 17, "Democrat"),
    # year-neighbor rows for the service back-fill query
    (1, 2020, 1, 10, "Republican"),
    (4, 2020, 1, 12, "Republican"),
]

# (id, chamber, year, session_index, name, last_crawl)
SESSIONS = [(100, 1, 2019, 0, "2019-2020 Regular Session", "2020-01-01 00:00:00")]

# (id, session_id, date, last_crawl)
SESSION_DAYS = [
    (200, 100, "2019-06-01", "2020-01-01 00:00:00"),
    (201, 100, "2019-06-02", None),  # uncrawled -> group incomplete
]

# (id, day_id, session_year, session_index, chamber, number, name, stamp, last_crawl)
ROLL_CALLS = [
    (300, 200, 2019, 0, 1, 1, "HB 1 PN 1", "2019-06-01 10:00:00", "2020-01-01 00:00:00"),
    (301, 200, 2019, 0, 1, 2, "HB 2 PN 2", None, "2020-01-01 00:00:00"),
]

# (session_id, roll_id, name, vote, member_id)
VOTES = [
    (100, 300, "SMITH, TOM", 1, None),  # nickname path -> member 1 or 2*
    (100, 300, "WHITE, MARY JO", 1, None),  # comma parse + exact
    (100, 300, "KELLER, M. K.", 2, None),  # initial disambiguation -> 5
    (100, 300, "BRANEKY", 3, None),  # substring pass -> 6
    (100, 300, "JONES", 1, None),  # ambiguous block -> unmatched
    (100, 301, "WHITE, MARY JO", 2, None),
]
# *members 1 and 2 are nickname-duplicates; only member 1 has 2019
# service in this fixture, so the block holds one Smith and the
# match is unambiguous.

_SNOWFLAKE_DATA = {
    "members": MEMBERS,
    "service": SERVICE,
    "sessions": SESSIONS,
    "session_days": SESSION_DAYS,
    "roll_calls": ROLL_CALLS,
    "votes": VOTES,
}

# Nickname pairs used by the fixture (subset of er.name_match.NICKNAMES,
# duplicated into the oracle as a VALUES table).
NICK_PAIRS = [("tom", "thomas"), ("mike", "michael"), ("bernie", "bernard")]


def snowflake(spark: SparkSession) -> dict[str, DataFrame]:
    """Fixture as schema-typed DataFrames (timestamps/dates parsed)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    out = {}
    for name, rows in _SNOWFLAKE_DATA.items():
        schema = schemas.SNOWFLAKE[name]
        stringly = T.StructType(
            [
                T.StructField(
                    f.name,
                    T.StringType()
                    if f.dataType.typeName() in ("timestamp", "date")
                    else f.dataType,
                    True,
                )
                for f in schema.fields
            ]
        )
        raw = spark.createDataFrame(rows, stringly)
        out[name] = raw.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
    return out


def values_sql(table: str) -> str:
    """Render a fixture table as a DuckDB VALUES CTE body."""
    schema = schemas.SNOWFLAKE[table]
    cols = [f.name for f in schema.fields]
    kinds = {f.name: f.dataType.typeName() for f in schema.fields}

    def lit(col: str, v) -> str:
        if v is None:
            null_type = {
                "timestamp": "TIMESTAMP",
                "date": "DATE",
                "string": "VARCHAR",
                "long": "BIGINT",
                "integer": "INTEGER",
            }[kinds[col]]
            return f"CAST(NULL AS {null_type})"
        if kinds[col] == "timestamp":
            return f"TIMESTAMP '{v}'"
        if kinds[col] == "date":
            return f"DATE '{v}'"
        if isinstance(v, str):
            escaped = v.replace("'", "''")
            return f"'{escaped}'"
        return str(v)

    rows = _SNOWFLAKE_DATA[table]
    body = ",\n    ".join(
        "(" + ", ".join(lit(c, v) for c, v in zip(cols, row)) + ")" for row in rows
    )
    col_list = ", ".join(cols)
    return f"(VALUES\n    {body}\n) AS {table}({col_list})"


def nicks_sql() -> str:
    body = ", ".join(f"('{a}', '{b}')" for a, b in NICK_PAIRS)
    return f"(VALUES {body}) AS nicks(nick, formal)"
