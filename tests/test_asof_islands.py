"""As-of join and gaps-and-islands operator tests (hand-computed)."""

from __future__ import annotations

import datetime as dt

import pytest

from palegislature_spark.operators import asof, islands
from tests.conftest import rows


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def clicks(spark):
    return spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00"), "c1"),
            (1, ts("2024-01-01 12:00:00"), "c2"),
            (2, ts("2024-01-01 09:00:00"), "c3"),
            (3, ts("2024-01-01 09:00:00"), "c4"),  # user with no purchases
        ],
        ["user_id", "ts", "click"],
    )


@pytest.fixture(scope="module")
def purchases(spark):
    return spark.createDataFrame(
        [
            (1, ts("2024-01-01 09:30:00"), 10.0, 100),
            (1, ts("2024-01-01 11:00:00"), 20.0, 101),
            (1, ts("2024-01-01 12:00:00"), 30.0, 102),  # ties c2's stamp
            (2, ts("2024-01-01 09:30:00"), 40.0, 103),  # after c3
        ],
        ["user_id", "ts", "amount", "pid"],
    )


def test_asof_backward_with_ties(clicks, purchases):
    got = rows(
        asof.asof_join(
            clicks, purchases, on=["user_id"], ts="ts", right_payload=["amount"], tiebreak="pid"
        ),
        "user_id",
        "click",
        "amount",
    )
    # c1@10:00 -> 9:30 purchase; c2@12:00 -> the equal-stamp 12:00 row
    # ('at or before' includes ties); c3@9:00 precedes every purchase;
    # user 3 has none.
    assert got == [
        (1, "c1", 10.0),
        (1, "c2", 30.0),
        (2, "c3", None),
        (3, "c4", None),
    ]


def test_asof_tiebreak_latest_wins(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01 12:00:00"), "x")], ["k", "ts", "tag"])
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 12:00:00"), 1.0, 7),
            (1, ts("2024-01-01 12:00:00"), 2.0, 9),
        ],
        ["k", "ts", "v", "seq"],
    )
    got = rows(
        asof.asof_join(left, right, on=["k"], ts="ts", right_payload=["v"], tiebreak="seq"),
        "v",
    )
    assert got == [(2.0,)]  # seq 9 sorts after seq 7


def test_int_islands_and_condense(spark):
    service = spark.createDataFrame(
        [(1, y) for y in [2007, 2008, 2009, 2010, 2013]] + [(2, 2020)],
        ["member_id", "year"],
    )
    runs = rows(
        islands.int_islands(service, ["member_id"], "year"),
        "member_id",
        "run_start",
        "run_end",
        "run_len",
    )
    assert runs == [(1, 2007, 2010, 4), (1, 2013, 2013, 1), (2, 2020, 2020, 1)]
    condensed = rows(islands.condense(service, ["member_id"], "year"), "member_id", "runs")
    # Reference display form (crawl.py:509-530): "2007-2010, 2013".
    assert condensed == [(1, "2007-2010, 2013"), (2, "2020")]


def test_int_islands_duplicates_collapse(spark):
    service = spark.createDataFrame(
        [(1, 2007), (1, 2007), (1, 2008)], ["member_id", "year"]
    )
    got = rows(islands.int_islands(service, ["member_id"], "year"), "run_start", "run_end")
    assert got == [(2007, 2008)]


def test_date_islands(spark):
    d = dt.date
    df = spark.createDataFrame(
        [
            (1, d(2024, 1, 1)),
            (1, d(2024, 1, 2)),
            (1, d(2024, 1, 4)),
            (2, d(2024, 1, 1)),
        ],
        ["k", "day"],
    )
    got = rows(islands.date_islands(df, ["k"], "day"), "k", "island_start", "island_end", "n_days")
    assert got == [
        (1, d(2024, 1, 1), d(2024, 1, 2), 2),
        (1, d(2024, 1, 4), d(2024, 1, 4), 1),
        (2, d(2024, 1, 1), d(2024, 1, 1), 1),
    ]
