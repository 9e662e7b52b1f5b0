"""Full crawl lifecycle on stored HTML: every reference pipeline in
one flow (``crawl.py:639-738`` orchestration, ``match_names.py``,
``dump.py``) — fetch -> HTML extract -> parse -> merge-upsert parquet
datasets -> ER vote-name resolution -> matrix export.

This is the 'a reference user can switch' test: the five crawl
stages, the snowflake store, the entity resolution, and the published
CSV contract all run against the same stored pages.
"""

from __future__ import annotations

import csv
import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from palegislature_spark.er.member_ingest import (
    service_from_observations,
    upsert_current_members,
)
from palegislature_spark.er.vote_names import (
    backfill_member_ids,
    match_vote_names,
    roll_years,
)
from palegislature_spark.pipelines import html_extract as hx
from palegislature_spark.pipelines import ingest
from palegislature_spark.pipelines.dump import export_matrices
from palegislature_spark.pipelines.status import crawl_statuses
from palegislature_spark.sources.merge import upsert_parquet

FETCHED = dt.datetime(2026, 1, 2, 3, 4, 5)

# The stored-HTML fixture lives in the package so the
# crawl_lifecycle_counts registry query can replay it through the
# driver gate; tests share the same constants.
from palegislature_spark.pipelines.fixture_pages import (  # noqa: E402
    BIO_HTML,
    BIO_URL,
    CURRENT_HTML,
    CURRENT_URL,
    DAY_HTML,
    DAY_ID,
    DAY_URL,
    ROLL_HTML,
    ROLL_ID,
    ROLL_URL,
    SESSION_HTML,
    SESSION_ID,
    SESSION_URL,
)


def _pages(spark, url, html, page_type):
    df = spark.createDataFrame(
        [Row(url=url, payload=html, fetched_at=FETCHED)], schema=ingest.FETCH_SCHEMA
    )
    return hx.extract_pages(df, page_type)


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    """Run all five stages; return the dataset directory."""
    root = tmp_path_factory.mktemp("crawl_store")

    # ---- stage 1: sessions + session days --------------------------
    sessions_raw, days_raw = ingest.parse_session_pages(
        _pages(spark, SESSION_URL, SESSION_HTML, "session")
    )
    sessions = sessions_raw.select(
        (F.col("year") * 100 + F.col("chamber") * 10 + F.col("session_index"))
        .cast("long")
        .alias("id"),
        "chamber",
        "year",
        "session_index",
        "name",
        "last_crawl",
    )
    upsert_parquet(spark, str(root / "sessions"), sessions, ["id"])

    days = days_raw.select(
        (
            (F.year("date") * 10000 + F.month("date") * 100 + F.dayofmonth("date"))
            * 10
            + F.col("chamber")
        )
        .cast("long")
        .alias("id"),
        (F.col("year") * 100 + F.col("chamber") * 10 + F.col("session_index"))
        .cast("long")
        .alias("session_id"),
        "date",
        "last_crawl",
    )
    upsert_parquet(spark, str(root / "session_days"), days, ["id"])

    # ---- stage 2: roll calls ---------------------------------------
    rolls_raw = ingest.parse_day_pages(_pages(spark, DAY_URL, DAY_HTML, "day"))
    rolls = rolls_raw.select(
        (
            (
                F.col("session_year") * 100
                + F.col("chamber") * 10
                + F.col("session_index")
            )
            * 1000
            + F.col("number")
        )
        .cast("long")
        .alias("id"),
        "day_id",
        "session_year",
        "session_index",
        "chamber",
        "number",
        "name",
        F.lit(None).cast("timestamp").alias("stamp"),
        F.lit(None).cast("timestamp").alias("last_crawl"),
    )
    upsert_parquet(spark, str(root / "roll_calls"), rolls, ["id"])

    # ---- stage 3: votes + roll stamps ------------------------------
    votes, stamps = ingest.parse_roll_pages(_pages(spark, ROLL_URL, ROLL_HTML, "roll"))
    upsert_parquet(spark, str(root / "votes"), votes, ["roll_id", "name"])
    stamp_updates = stamps.select(
        "id",
        F.col("stamp").alias("__new_stamp"),
        F.col("last_crawl").alias("__lc"),
    )
    stamped = (
        spark.read.parquet(str(root / "roll_calls"))
        .join(F.broadcast(stamp_updates), "id", "left")
        .select(
            "id",
            "day_id",
            "session_year",
            "session_index",
            "chamber",
            "number",
            "name",
            F.coalesce(F.col("__new_stamp"), F.col("stamp")).alias("stamp"),
            F.coalesce(F.col("__lc"), F.col("last_crawl")).alias("last_crawl"),
        )
    )
    upsert_parquet(spark, str(root / "roll_calls"), stamped, ["id"])

    # ---- stage 4: current member list ------------------------------
    empty_members = spark.createDataFrame(
        [],
        schema="id long, house_archive_id long, house_current_id long, "
        "senate_archive_id long, senate_current_id long, first string, "
        "middle string, last string, suffix string, dob date, last_crawl timestamp",
    )
    _crawl, obs = ingest.parse_current_roll_pages(
        _pages(spark, CURRENT_URL, CURRENT_HTML, "current_roll")
    )
    members, member_map, violations = upsert_current_members(
        empty_members, obs, chamber=1
    )
    assert violations.count() == 0
    upsert_parquet(spark, str(root / "members"), members, ["id"])
    service = service_from_observations(obs, member_map, chamber=1)
    upsert_parquet(
        spark, str(root / "service"), service, ["member_id", "year", "chamber"]
    )

    # ---- stage 5: bio of member 1 ----------------------------------
    bio_service, member_updates, bio_violations = ingest.parse_bio_pages(
        _pages(spark, BIO_URL, BIO_HTML, "bio")
    )
    assert bio_violations.count() == 0
    upsert_parquet(
        spark, str(root / "service"), bio_service, ["member_id", "year", "chamber"]
    )
    patched = (
        spark.read.parquet(str(root / "members"))
        .join(
            F.broadcast(
                member_updates.select("id", F.col("dob").alias("__dob"))
            ),
            "id",
            "left",
        )
        .select(
            *[
                F.coalesce(F.col("__dob"), F.col("dob")).alias("dob")
                if c == "dob"
                else F.col(c)
                for c in members.columns
            ]
        )
    )
    upsert_parquet(spark, str(root / "members"), patched, ["id"])
    return root


def _read(spark, root, name):
    return spark.read.parquet(str(root / name))


def test_store_contents(spark, store):
    assert _read(spark, store, "sessions").count() == 1
    [day] = _read(spark, store, "session_days").collect()
    assert day.session_id == SESSION_ID and day.date == dt.date(2019, 6, 1)
    [roll] = _read(spark, store, "roll_calls").collect()
    assert roll.id == ROLL_ID and roll.stamp == dt.datetime(2019, 6, 1, 10, 0)
    assert roll.last_crawl is not None
    votes = _read(spark, store, "votes")
    assert votes.count() == 3
    assert votes.filter("member_id IS NOT NULL").count() == 0  # late binding
    members = {r.last: r for r in _read(spark, store, "members").collect()}
    assert set(members) == {"Smith", "Doe", "White"}
    assert members["Smith"].dob == dt.date(1970, 6, 1)  # bio backfill
    svc = _read(spark, store, "service")
    # 3 members x {2019, 2020} from the list page + Smith 2017-2018 bio
    assert svc.count() == 8


def test_crawl_status_complete(spark, store):
    [status] = crawl_statuses(
        _read(spark, store, "sessions"),
        _read(spark, store, "session_days"),
        _read(spark, store, "roll_calls"),
    ).collect()
    assert (status.year, status.chamber, status.status) == (2019, 1, "complete")


def test_er_resolves_and_backfills(spark, store):
    votes = _read(spark, store, "votes")
    roll_calls = _read(spark, store, "roll_calls")
    session_days = _read(spark, store, "session_days")
    members = _read(spark, store, "members")
    service = _read(spark, store, "service")

    matches = match_vote_names(votes, roll_calls, session_days, members, service)
    by_name = {r.name: r.member_id for r in matches.collect()}
    ids = {r.last: r.id for r in members.collect()}
    assert by_name == {
        "SMITH": ids["Smith"],
        "DOE": ids["Doe"],
        "WHITE": ids["White"],
    }

    years = roll_years(roll_calls, session_days)
    filled = backfill_member_ids(votes, matches, years)
    assert filled.filter("member_id IS NULL").count() == 0


def test_export_matrix_csv(spark, store, tmp_path):
    votes = _read(spark, store, "votes")
    roll_calls = _read(spark, store, "roll_calls")
    session_days = _read(spark, store, "session_days")
    members = _read(spark, store, "members")
    service = _read(spark, store, "service")
    matches = match_vote_names(votes, roll_calls, session_days, members, service)
    filled = backfill_member_ids(
        votes, matches, roll_years(roll_calls, session_days)
    )

    out = tmp_path / "vote_data"
    written = export_matrices(
        filled,
        roll_calls,
        session_days,
        _read(spark, store, "sessions"),
        members,
        service,
        str(out),
    )
    assert written == [str(out / "2019" / "House.csv")]
    with open(written[0]) as f:
        rows = list(csv.reader(f))
    # 3-header contract: names, districts, parties; columns ordered by
    # district (White 7, Smith 18, Doe 44); then the single roll row.
    assert rows[0][:3] == ["Name", "Number", "Date"]
    assert [c.split()[-1] for c in rows[0][3:]] == ["White", "Smith", "Doe"]
    assert rows[1] == ["District", "", "", "7", "18", "44"]
    assert rows[2] == ["Party", "", "", "Democrat", "Democrat", "Republican"]
    assert rows[3][0] == "HB 1 PN 1"
    assert rows[3][2] == "2019-06-01 10:00:00"
    assert rows[3][3:] == ["X", "Y", "N"]  # White, Smith, Doe letters
