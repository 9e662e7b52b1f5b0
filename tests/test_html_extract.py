"""Stored real-shaped HTML -> extract (pandas UDF) -> parse (from_json)
-> merge/ER, covering crawl stages 1-5 end to end on fixtures whose
DOM mirrors the reference pages (sessions dropdown ``crawl.py:73-83``,
calendar ``:90-113``, roll DataTable ``:151-158``, vote divs
``:191-198``, member lists ``:302-321,378-506``, bio tables
``:588-611``)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from palegislature_spark.er.member_ingest import (
    service_from_observations,
    upsert_archive_members,
    upsert_current_members,
)
from palegislature_spark.pipelines import html_extract as hx
from palegislature_spark.pipelines import ingest
from palegislature_spark.sources import redirects

SESSION_URL = "https://example.org/SessionDays.cfm?Chamber=H"
SESSION_HTML = """
<html><body>
<select id="SessID">
  <option value="20230" selected>2023 Regular Session</option>
  <option value="20231">2023 Special Session #1</option>
  <option value="20210">2021 Regular Session</option>
</select>
<div class="Column-OneHalf">
  <h3>Session Days</h3>
  <div class="CalendarDisplay-List-Row">
    <div class="CalendarDisplay-List-Month">January</div>
    <a>3</a><a>17&nbsp;*</a>
  </div>
  <div class="CalendarDisplay-List-Row">
    <div class="CalendarDisplay-List-Month">June</div>
    <a>5</a>
  </div>
</div>
<div class="Column-OneHalf">
  <h3>Scheduled Session Days</h3>
  <div class="CalendarDisplay-List-Row">
    <div class="CalendarDisplay-List-Month">December</div>
    <a>25</a>
  </div>
</div>
</body></html>
"""

DAY_URL = "https://example.org/sessionPriorDays.cfm?day_id=7"
DAY_HTML = """
<html><body>
<table class="DataTable"><tbody>
<tr><td><a id="RCLink1"
  href="rc_view_action2.cfm?sess_yr=2023&amp;sess_ind=0&amp;rc_body=H&amp;rc_nbr=101">
  HB 1 Final Passage</a></td></tr>
<tr><td><a id="RCLink2"
  href="rc_view_action2.cfm?sess_yr=2023&amp;sess_ind=0&amp;rc_body=H&amp;rc_nbr=102">
  HB 2 Third Consideration</a></td></tr>
</tbody></table>
</body></html>
"""

ROLL_URL = "https://example.org/rc_view_action2.cfm?session_id=3&roll_id=11"
ROLL_HTML = """
<html><body>
<div class="RollCalls-ListContainer">
  <div class="Column-OneFifth">format</div>
  <div><span>Y</span> ADAMS</div>
  <div><span>N</span> McRAE</div>
  <div><span>X</span> SMITH, M. K.</div>
</div>
<div class="Column-OneFourth">
  <div>Roll Call Info</div>
  <div>
    <div>06/05/2023</div>
    <div>11:30 AM</div>
    <div>legend</div>
  </div>
</div>
</body></html>
"""

MEMBER_LIST_URL = "https://example.org/ViewAll.cfm?body=S"
MEMBER_LIST_HTML = """
<html><body>
<div class="Column-Full">
  <a href="bio.cfm?ID=123">SMITH, JOHN A.</a>
  <a href="bio.cfm?ID=124">McRAE, BRIAN</a>
  <a href="about.cfm">not a member link</a>
</div>
</body></html>
"""

CURRENT_ROLL_URL = "https://example.org/mbrList.cfm?body=H&SessYear=2023"
CURRENT_ROLL_HTML = """
<html><body>
<select id="SessYear">
  <option value="2023" selected>2023-2024</option>
  <option value="2021">2021-2022</option>
</select>
<div class="MemberInfoList-MemberWrapper">
  <div class="MemberInfoList-MemberBio">
    <a href="bio.cfm?id=501">John Smith</a>
    (D)<br/>
    District 18
  </div>
</div>
<div class="MemberInfoList-MemberWrapper">
  <div class="MemberInfoList-MemberBio">
    <a href="bio.cfm?id=502">Jane Doe</a>
    (R)<br/>
    District 44
  </div>
</div>
</body></html>
"""

BIO_URL = "https://example.org/bio.cfm?member_id=5&chamber=1"
BIO_HTML = """
<html><body>
<h1>John Smith</h1>
<h4>6/1/1970 - Present</h4>
<div class="bio-table"><table>
<tr><th>Sessions</th><th>Office</th><th>Position</th><th>District</th><th>Party</th></tr>
<tr><td>2019-2020</td><td>Representative</td><td></td><td>18</td><td>Democrat</td></tr>
<tr><td>2021</td><td>Chief Clerk</td><td></td><td>N/A</td><td></td></tr>
<tr><td>2023</td><td>Speaker of the House</td><td></td><td>18</td><td>Democrat</td></tr>
<tr><td>2024</td><td>Representative</td><td></td><td>N/A</td><td>Democrat</td></tr>
</table></div>
</body></html>
"""


def _pages(spark, url, html):
    return spark.createDataFrame(
        [Row(url=url, payload=html, fetched_at=dt.datetime(2026, 1, 1))],
        schema=ingest.FETCH_SCHEMA,
    )


# --------------------------------------------------------------------------
# Stages 1-3: HTML -> the same typed rows the JSON path produces
# --------------------------------------------------------------------------


def test_session_page_html(spark):
    pages = hx.extract_pages(_pages(spark, SESSION_URL, SESSION_HTML), "session")
    sessions, days = ingest.parse_session_pages(pages)
    srows = {(r.year, r.session_index): r.name for r in sessions.collect()}
    assert srows == {
        (2023, 0): "2023 Regular Session",
        (2023, 1): "2023 Special Session #1",
        (2021, 0): "2021 Regular Session",
    }
    assert sessions.select("chamber").distinct().collect() == [Row(chamber=1)]
    drows = sorted(r.date for r in days.collect())
    # Scheduled column skipped; nbsp-suffixed day parsed; selected
    # session year (2023) applied to every day.
    assert drows == [
        dt.date(2023, 1, 3),
        dt.date(2023, 1, 17),
        dt.date(2023, 6, 5),
    ]


def test_day_page_html(spark):
    pages = hx.extract_pages(_pages(spark, DAY_URL, DAY_HTML), "day")
    rolls = ingest.parse_day_pages(pages)
    rows = sorted(
        (r.day_id, r.number, r.session_year, r.session_index, r.chamber, r.name)
        for r in rolls.collect()
    )
    assert rows == [
        (7, 101, 2023, 0, 1, "HB 1 Final Passage"),
        (7, 102, 2023, 0, 1, "HB 2 Third Consideration"),
    ]


def test_roll_page_html(spark):
    pages = hx.extract_pages(_pages(spark, ROLL_URL, ROLL_HTML), "roll")
    votes, stamps = ingest.parse_roll_pages(pages)
    vrows = sorted((r.name, r.vote) for r in votes.collect())
    # Y/N/X letters -> 1/2/3 through the codec; names keep raw form.
    assert vrows == [("ADAMS", 1), ("McRAE", 2), ("SMITH, M. K.", 3)]
    assert votes.select("session_id", "roll_id").distinct().collect() == [
        Row(session_id=3, roll_id=11)
    ]
    [stamp] = stamps.collect()
    assert stamp.id == 11
    assert stamp.stamp == dt.datetime(2023, 6, 5, 11, 30)


def test_roll_page_html_no_timestamp(spark):
    html = ROLL_HTML.replace("<div>11:30 AM</div>\n    <div>legend</div>", "")
    pages = hx.extract_pages(_pages(spark, ROLL_URL, html), "roll")
    _, stamps = ingest.parse_roll_pages(pages)
    assert stamps.collect()[0].stamp is None


# --------------------------------------------------------------------------
# Stage 4a: archive member lists
# --------------------------------------------------------------------------


def test_member_list_html_upsert(spark):
    pages = hx.extract_pages(
        _pages(spark, MEMBER_LIST_URL, MEMBER_LIST_HTML), "member_list"
    )
    obs = ingest.parse_member_list_pages(pages)
    rows = {r.archive_id: r.name.asDict() for r in obs.collect()}
    assert rows[123] == {
        "first": "John",
        "middle": "A.",
        "last": "Smith",
        "suffix": None,
    }
    # McRAE passes through advanced_decapitalization (TWO_CAPS).
    assert rows[124]["last"] == "McRae"

    members = spark.createDataFrame(
        [
            # existing senate member matching archive 123, stale name case
            (1, None, None, 123, None, "JOHN", "A.", "SMITH", None, None, None),
            (2, 9, None, None, None, "Alice", None, "Jones", None, None, None),
        ],
        schema="id long, house_archive_id long, house_current_id long, "
        "senate_archive_id long, senate_current_id long, first string, "
        "middle string, last string, suffix string, dob date, last_crawl timestamp",
    )
    out = upsert_archive_members(members, obs, chamber=2)
    by_id = {r.id: r for r in out.collect()}
    assert len(by_id) == 3
    assert by_id[1].first == "John" and by_id[1].last == "Smith"  # refreshed
    assert by_id[2].first == "Alice"  # untouched
    [new] = [r for r in by_id.values() if r.id not in (1, 2)]
    assert new.senate_archive_id == 124 and new.last == "McRae"
    assert new.id == 3  # max existing + 1


# --------------------------------------------------------------------------
# Stage 4b: current member lists (+ redirect resolution)
# --------------------------------------------------------------------------


def _current_roll_obs(spark, resolutions=None):
    pages = hx.extract_pages(
        _pages(spark, CURRENT_ROLL_URL, CURRENT_ROLL_HTML), "current_roll"
    )
    return ingest.parse_current_roll_pages(pages, resolutions)


def test_current_roll_html_parse(spark):
    member_crawl, obs = _current_roll_obs(spark)
    crawl_names = sorted(r.name for r in member_crawl.collect())
    assert crawl_names == ["2021 HOUSE", "2023 HOUSE"]
    rows = {r.current_id: r for r in obs.collect()}
    assert rows[501].party == "Democrat" and rows[501].district == 18
    assert rows[502].party == "Republican" and rows[502].district == 44
    assert rows[501].years == [2023, 2024]
    assert rows[501].archive_id is None


def test_current_roll_redirect_resolution(spark):
    resolutions = spark.createDataFrame(
        [("bio.cfm?id=501", "https://archives.example.org/people?ID=123")],
        schema="url string, resolved string",
    )
    _, obs = _current_roll_obs(spark, resolutions)
    rows = {r.current_id: r for r in obs.collect()}
    assert rows[501].archive_id == 123
    assert rows[502].archive_id is None


def test_current_roll_member_upsert_and_service(spark):
    resolutions = spark.createDataFrame(
        [("bio.cfm?id=501", "https://archives.example.org/people?ID=123")],
        schema="url string, resolved string",
    )
    _, obs = _current_roll_obs(spark, resolutions)
    members = spark.createDataFrame(
        [(1, 123, None, None, None, "John", None, "Smith", None, None, None)],
        schema="id long, house_archive_id long, house_current_id long, "
        "senate_archive_id long, senate_current_id long, first string, "
        "middle string, last string, suffix string, dob date, last_crawl timestamp",
    )
    out, member_map, violations = upsert_current_members(members, obs, chamber=1)
    assert violations.count() == 0
    by_id = {r.id: r for r in out.collect()}
    # archive match patched its missing current_id (crawl.py:458-459)
    assert by_id[1].house_current_id == 501
    [new] = [r for r in by_id.values() if r.id != 1]
    assert new.house_current_id == 502 and new.last == "Doe"

    mapping = {r.current_id: r.member_id for r in member_map.collect()}
    assert mapping == {501: 1, 502: new.id}

    service = service_from_observations(obs, member_map, chamber=1)
    srows = sorted(
        (r.member_id, r.year, r.chamber, r.district, r.party)
        for r in service.collect()
    )
    assert srows == [
        (1, 2023, 1, 18, "Democrat"),
        (1, 2024, 1, 18, "Democrat"),
        (new.id, 2023, 1, 44, "Republican"),
        (new.id, 2024, 1, 44, "Republican"),
    ]


def test_current_roll_name_mismatch_violation(spark):
    _, obs = _current_roll_obs(spark)
    members = spark.createDataFrame(
        [(1, None, 501, None, None, "Robert", None, "Wilson", None, None, None)],
        schema="id long, house_archive_id long, house_current_id long, "
        "senate_archive_id long, senate_current_id long, first string, "
        "middle string, last string, suffix string, dob date, last_crawl timestamp",
    )
    out, member_map, violations = upsert_current_members(members, obs, chamber=1)
    vrows = {(r.current_id, r.kind) for r in violations.collect()}
    assert (501, "name mismatch") in vrows
    # the mismatched observation neither patches nor inserts
    mapping = {r.current_id for r in member_map.collect()}
    assert 501 not in mapping and 502 in mapping


# --------------------------------------------------------------------------
# Stage 5: bios
# --------------------------------------------------------------------------


def test_bio_page_html(spark):
    pages = hx.extract_pages(_pages(spark, BIO_URL, BIO_HTML), "bio")
    service, updates, violations = ingest.parse_bio_pages(pages)

    srows = sorted(
        (r.member_id, r.year, r.chamber, r.district, r.party)
        for r in service.collect()
    )
    # Chief Clerk skipped; weird office (Speaker) excluded to violations;
    # 2019-2020 expanded; N/A district -> NULL.
    assert srows == [
        (5, 2019, 1, 18, "Democrat"),
        (5, 2020, 1, 18, "Democrat"),
        (5, 2024, 1, None, "Democrat"),
    ]
    [v] = violations.collect()
    assert v.office == "Speaker of the House" and v.violation == "weird office"

    [u] = updates.collect()
    assert u.id == 5
    assert u.dob == dt.date(1970, 6, 1)
    assert u.name.first == "John" and u.name.last == "Smith"


def test_bio_error_page(spark):
    html = '<html><body><div class="Message-Error">No bio found</div></body></html>'
    pages = hx.extract_pages(_pages(spark, BIO_URL, html), "bio")
    service, updates, violations = ingest.parse_bio_pages(pages)
    assert service.count() == 0 and updates.count() == 0 and violations.count() == 0


# --------------------------------------------------------------------------
# Redirect resolver (F9)
# --------------------------------------------------------------------------


def test_chain_resolver_follows_relative_redirects():
    heads = {
        "https://a.org/x": (301, "/y"),
        "https://a.org/y": (302, "https://b.org/z"),
        "https://b.org/z": (200, None),
        "https://a.org/direct": (200, None),
    }
    resolve = redirects.chain_resolver(lambda u: heads[u])
    assert resolve(["https://a.org/x", "https://a.org/direct"]) == [
        ("https://a.org/x", "https://b.org/z"),
        ("https://a.org/direct", None),
    ]


def test_resolve_urls_consults_cache_first(spark, tmp_path):
    calls = []

    def head(url):
        calls.append(url)
        return (301, "https://t.org/final") if url == "https://a.org/m" else (200, None)

    cache = spark.createDataFrame(
        [("https://a.org/cached", "https://t.org/old")],
        schema="url string, resolved string",
    )
    urls = spark.createDataFrame(
        [("https://a.org/cached",), ("https://a.org/m",)], schema="url string"
    )
    out = redirects.resolve_urls(urls, cache, redirects.chain_resolver(head))
    rows = {r.url: r.resolved for r in out.collect()}
    assert rows == {
        "https://a.org/cached": "https://t.org/old",
        "https://a.org/m": "https://t.org/final",
    }
    assert "https://a.org/cached" not in calls  # memo hit never re-fetches

    # YAML write-back round-trip (crawl.py:361 resolutions.yaml)
    path = str(tmp_path / "resolutions.yaml")
    redirects.save_cache(out, path)
    reloaded = redirects.load_cache(spark, path)
    assert {r.url: r.resolved for r in reloaded.collect()} == rows


def test_extract_pages_unknown_type(spark):
    with pytest.raises(ValueError, match="unknown page_type"):
        hx.extract_pages(_pages(spark, "u", "<html/>"), "nope")


class _HeadResponse:
    def __init__(self, status_code, location=None):
        self.status_code = status_code
        self.headers = {"Location": location} if location else {}


class _HeadSession:
    """requests.Session stand-in for http_head: asserts redirects are
    NOT auto-followed (the chain walk owns that)."""

    def __init__(self, table):
        self.table = table
        self.headers = {}

    def head(self, url, allow_redirects=True, timeout=None):
        assert allow_redirects is False
        status, loc = self.table[url]
        return _HeadResponse(status, loc)


def test_http_head_real_path_drives_chain_resolver():
    table = {
        "https://a.org/x": (301, "/y"),
        "https://a.org/y": (302, "https://b.org/z"),
        "https://b.org/z": (200, None),
    }
    session = _HeadSession(table)
    resolve = redirects.chain_resolver(
        lambda u: redirects.http_head(u, session=session)
    )
    assert resolve(["https://a.org/x"]) == [("https://a.org/x", "https://b.org/z")]
