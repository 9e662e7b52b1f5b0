"""Small legislative snowflake fixture (FIXTURES.md §1, deterministic).

Hand-authored rather than random: every dirty case the ER operators
exist for appears at least once — nickname duplicates, initial vs
full first, hyphenated surnames, Mc-case, shared surnames in one
chamber, a dob-blocked duplicate, missing stamps, and raw vote-name
spellings needing rule repair.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession

from palegislature_spark import schemas

D = dt.date
TS = dt.datetime


MEMBERS = [
    # id, h_arch, h_cur, s_arch, s_cur, first, middle, last, suffix, dob, last_crawl
    (1, 11, None, None, None, "Thomas", None, "Smith", None, D(1960, 1, 1), None),
    # nickname duplicate of 1, disjoint id fields (FIXTURES (a))
    (2, None, 21, None, None, "Tom", None, "Smith", None, None, None),
    (3, 13, None, None, None, "Mary", "Jo", "White", None, D(1955, 5, 5), None),
    (4, 14, None, None, None, "John", None, "Keller", None, None, None),
    # second Keller in same chamber-year -> shared-surname block (c)
    (5, 15, None, None, None, "Mark", "K.", "Keller", None, None, None),
    (6, 16, None, None, None, "Brian", None, "McRae", None, D(1970, 7, 7), None),
    # initial-vs-full duplicate of 7 via dob block (b)
    (7, 17, None, None, None, "J.", None, "Doe", None, D(1950, 2, 2), None),
    (8, None, 28, None, None, "John", None, "Doe", None, D(1950, 2, 2), None),
    (9, 19, None, None, None, "Maria", None, "Cook-Artis", None, None, None),
    (10, 110, None, None, None, "Dawn", None, "Krueger", None, None, None),
]

# service: member_id, year, chamber, district, party
SERVICE = [
    (1, 2019, 1, 10, "Republican"),
    (2, 2019, 1, 10, "Republican"),  # duplicate person, same seat
    (3, 2019, 1, 11, "Democrat"),
    (4, 2019, 1, 12, "Republican"),
    (5, 2019, 1, 13, "Republican"),
    (6, 2019, 1, 14, "Democrat"),
    (7, 2019, 1, 15, "Democrat"),
    (9, 2019, 1, 16, "Democrat"),
    (10, 2019, 1, 17, "Democrat"),
    # 2020 rows for the service-rule back-fill case (member 3 missing 2020)
    (1, 2020, 1, 10, "Republican"),
    (4, 2020, 1, 12, "Republican"),
]

SESSIONS = [
    # id, chamber, year, session_index, name, last_crawl
    (100, 1, 2019, 0, "2019-2020 Regular Session", TS(2020, 1, 1)),
]

SESSION_DAYS = [
    # id, session_id, date, last_crawl
    (200, 100, D(2019, 6, 1), TS(2020, 1, 1)),
    (201, 100, D(2019, 6, 2), TS(2020, 1, 1)),
]

ROLL_CALLS = [
    # id, day_id, session_year, session_index, chamber, number, name, stamp, last_crawl
    (300, 200, 2019, 0, 1, 1, "HB 1 PN 1", TS(2019, 6, 1, 10, 0), TS(2020, 1, 1)),
    (301, 200, 2019, 0, 1, 2, "HB 2 PN 2", None, TS(2020, 1, 1)),  # missing stamp
    (302, 201, 2019, 0, 1, 3, "MASTER ROLL CALL", TS(2019, 6, 2, 9, 0), TS(2020, 1, 1)),
]

# votes: session_id, roll_id, name, vote, member_id
# Raw names in scraped ALL-CAPS style; member_id NULL = unresolved.
VOTES = [
    (100, 300, "SMITH", 1, None),  # unique after dedup merges 1&2
    (100, 300, "WHITE, MARY JO", 1, None),
    (100, 300, "KELLER, M. K.", 2, None),  # shared-surname block, initial match -> 5
    (100, 300, "MCRAE", 1, None),
    (100, 300, "DOE", 1, None),
    (100, 300, "ARTIS", 3, None),  # substring-pass case -> COOK-ARTIS
    (100, 300, "KRUGER", 4, None),  # misspelling; needs a rule rename
    (100, 301, "SMITH", 2, None),
    (100, 301, "WHITE, MARY JO", 2, None),
    (100, 302, "SMITH", 1, 1),  # already resolved
]


def build(spark: SparkSession):
    """Create the snowflake as DataFrames with declared schemas."""
    data = {
        "members": MEMBERS,
        "service": SERVICE,
        "sessions": SESSIONS,
        "session_days": SESSION_DAYS,
        "roll_calls": ROLL_CALLS,
        "votes": VOTES,
    }
    return {
        name: spark.createDataFrame(rows, schemas.SNOWFLAKE[name])
        for name, rows in data.items()
    }
