"""Ingest pipeline tests: injected page source, JVM-side UDTF parse,
work-queue -> fetch -> parse -> upsert end-to-end."""

from __future__ import annotations

import json

import pytest

from palegislature_spark.pipelines import ingest
from palegislature_spark.sources import merge_by_key, work_queue
from tests.conftest import rows

PAGES = {
    "https://x/session?chamber=1": json.dumps(
        {
            "chamber": 1,
            "sessions": [
                {"code": "20190", "name": "2019-2020 Regular Session", "selected": True},
                {"code": "20191", "name": "2019-2020 Special Session #1", "selected": False},
                {"code": "20170", "name": "2017-2018 Regular Session", "selected": False},
            ],
            "days": [
                {"month": "June", "day": 1},
                {"month": "June", "day": 2},
                {"month": "September", "day": 23},
            ],
        }
    ),
    "https://x/session?chamber=2": json.dumps(
        {
            "chamber": 2,
            "sessions": [
                {"code": "20190", "name": "2019-2020 Regular Session", "selected": True}
            ],
            "days": [{"month": "March", "day": 14}],
        }
    ),
}


@pytest.fixture(scope="module")
def fetched(spark):
    urls = spark.createDataFrame(
        [(u, None) for u in sorted(PAGES)], "url string, last_crawl timestamp"
    )
    queued = work_queue(urls, ["url"], limit=10)
    return ingest.fetch_pages(queued, ingest.stored_page_source(PAGES)).persist()


def test_fetch_pages_shapes(fetched):
    got = fetched.collect()
    assert sorted(r["url"] for r in got) == sorted(PAGES)
    assert all(r["payload"] and r["fetched_at"] is not None for r in got)


def test_parse_sessions_udtf_shape(fetched):
    sessions, _ = ingest.parse_session_pages(fetched)
    got = rows(sessions, "chamber", "year", "session_index", "name")
    assert got == [
        (1, 2017, 0, "2017-2018 Regular Session"),
        (1, 2019, 0, "2019-2020 Regular Session"),
        (1, 2019, 1, "2019-2020 Special Session #1"),
        (2, 2019, 0, "2019-2020 Regular Session"),
    ]


def test_parse_days_against_selected_session(fetched):
    _, days = ingest.parse_session_pages(fetched)
    got = rows(
        days.selectExpr("chamber", "year", "cast(date as string) as date"),
        "chamber",
        "date",
    )
    assert got == [
        (1, "2019-06-01"),
        (1, "2019-06-02"),
        (1, "2019-09-23"),
        (2, "2019-03-14"),
    ]


def test_ingest_upsert_roundtrip(spark, fetched):
    """Second crawl of the same pages must not duplicate rows."""
    sessions, _ = ingest.parse_session_pages(fetched)
    once = merge_by_key(None, sessions, ["chamber", "year", "session_index"])
    twice = merge_by_key(once, sessions, ["chamber", "year", "session_index"])
    assert twice.count() == once.count() == 4
