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


DAY_PAGES = {
    "https://x/day?200": json.dumps(
        {
            "day_id": 200,
            "rolls": [
                {"rc_nbr": 1, "sess_yr": 2019, "sess_ind": 0, "rc_body": "H", "name": "HB 1 PN 1"},
                {"rc_nbr": 2, "sess_yr": 2019, "sess_ind": 0, "rc_body": "S", "name": "SB 2"},
            ],
        }
    )
}

ROLL_PAGES = {
    "https://x/roll?300": json.dumps(
        {
            "session_id": 100,
            "roll_id": 300,
            "votes": [
                {"vote": "Y", "name": "SMITH"},
                {"vote": "N", "name": "WHITE, MARY JO"},
                {"vote": "E", "name": "DOE"},
                {"vote": "X", "name": "JONES"},
            ],
            "date_s": "06/01/2019",
            "time_s": "10:00 AM",
        }
    ),
    "https://x/roll?301": json.dumps(
        {
            "session_id": 100,
            "roll_id": 301,
            "votes": [{"vote": "Y", "name": "SMITH"}],
            "date_s": "06/01/2019",
            "time_s": None,  # missing time section -> NULL stamp
        }
    ),
}


def test_parse_day_pages(spark):
    pages = ingest.fetch_pages(
        spark.createDataFrame([(u,) for u in DAY_PAGES], "url string"),
        ingest.stored_page_source(DAY_PAGES),
    )
    got = rows(
        ingest.parse_day_pages(pages),
        "day_id",
        "session_year",
        "chamber",
        "number",
        "name",
    )
    assert got == [
        (200, 2019, 1, 1, "HB 1 PN 1"),
        (200, 2019, 2, 2, "SB 2"),
    ]


def test_parse_roll_pages(spark):
    import datetime as dt

    pages = ingest.fetch_pages(
        spark.createDataFrame([(u,) for u in sorted(ROLL_PAGES)], "url string"),
        ingest.stored_page_source(ROLL_PAGES),
    )
    votes, stamps = ingest.parse_roll_pages(pages)
    got = rows(votes, "roll_id", "name", "vote", "member_id")
    assert got == [
        (300, "DOE", 4, None),
        (300, "JONES", 3, None),
        (300, "SMITH", 1, None),
        (300, "WHITE, MARY JO", 2, None),
        (301, "SMITH", 1, None),
    ]
    st = {r["id"]: r["stamp"] for r in stamps.collect()}
    assert st[300] == dt.datetime(2019, 6, 1, 10, 0)
    assert st[301] is None


# --------------------------------------------------------------------------
# Real HTTP fetch path (dormant in-sandbox): mechanics via injected session
# --------------------------------------------------------------------------


class _FakeResponse:
    def __init__(self, status_code=200, text="", headers=None):
        self.status_code = status_code
        self.text = text
        self.headers = headers or {}

    def raise_for_status(self):
        if self.status_code >= 400:
            raise ConnectionError(f"HTTP {self.status_code}")


class _ScriptedSession:
    """requests.Session stand-in: per-URL list of responses/exceptions,
    consumed one per attempt — lets tests script transient failures."""

    def __init__(self, script):
        self.script = {u: list(attempts) for u, attempts in script.items()}
        self.headers = {}
        self.attempts = {}

    def get(self, url, timeout=None):
        self.attempts[url] = self.attempts.get(url, 0) + 1
        step = self.script[url].pop(0)
        if isinstance(step, Exception):
            raise step
        return step


def test_http_page_source_retries_then_succeeds():
    session = _ScriptedSession(
        {
            "https://x/ok": [_FakeResponse(200, "payload-ok")],
            "https://x/flaky": [
                ConnectionError("transient"),
                _FakeResponse(503, ""),
                _FakeResponse(200, "payload-after-retries"),
            ],
        }
    )
    fetch = ingest.http_page_source(
        session_factory=lambda: session, retries=3, backoff=0.0
    )
    got = fetch(["https://x/ok", "https://x/flaky"])
    assert got == [
        ("https://x/ok", "payload-ok"),
        ("https://x/flaky", "payload-after-retries"),
    ]
    assert session.attempts["https://x/flaky"] == 3
    assert session.headers["User-Agent"] == "palegislature_spark"


def test_http_page_source_raises_after_exhausted_retries():
    session = _ScriptedSession(
        {"https://x/dead": [ConnectionError("down")] * 2}
    )
    fetch = ingest.http_page_source(
        session_factory=lambda: session, retries=2, backoff=0.0
    )
    with pytest.raises(ConnectionError):
        fetch(["https://x/dead"])


def test_http_page_source_through_fetch_pages(spark):
    # End-to-end through the executor-side mapInPandas plumbing: the
    # session factory pickles to executors and builds one session per
    # partition batch.  Everything is defined inside the factory so
    # cloudpickle ships it by value (test modules aren't importable on
    # executors).
    pages = dict(PAGES)

    def session_factory():
        class Resp:
            def __init__(self, text):
                self.status_code, self.text, self.headers = 200, text, {}

            def raise_for_status(self):
                pass

        class Sess:
            headers = {}

            def get(self, url, timeout=None):
                return Resp(pages[url])

        return Sess()

    fetch = ingest.http_page_source(session_factory=session_factory, retries=1)
    urls = spark.createDataFrame([(u,) for u in sorted(PAGES)], "url string")
    out = ingest.fetch_pages(urls, fetch)
    got = {r["url"]: r["payload"] for r in out.collect()}
    assert got == PAGES
