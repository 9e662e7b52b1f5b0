"""Crawl orchestration: the reference's five-stage ``__main__``
(``crawl.py:639-738``) as composable batch jobs over a parquet store.

Each stage is the SURVEY §3.1 shape — scan the state table for work
(``sources/queue.py``), fetch through an injectable page source
(``ingest.fetch_pages``), extract + parse (``html_extract`` +
``ingest``), merge-upsert (``sources/merge.upsert_parquet``).  Stages
1→2→3 are strictly ordered (days need sessions, rolls need days);
member stages 4-5 are independent of 2-3, exactly as the reference
runs them.

Surrogate ids: the reference relies on SQLite autoincrement; a
distributed store cannot.  Dimension ids here are deterministic
functions of the natural keys (session = year*100 + chamber*10 +
index; day = yyyymmdd*10 + chamber; roll = session_id*1000 + number),
so re-crawls and replays produce identical ids with no coordination
— the property an autoincrement cannot give on 1000 executors.
Members are the exception (no natural key until ER runs); their ids
allocate off max(id) inside ``er/member_ingest.py``, which is safe
because stage 4 batches are page-sized.

Store layout: ``<root>/{sessions,session_days,roll_calls,votes,
members,service}`` parquet datasets with the SURVEY §1.1 schemas.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from palegislature_spark.er.member_ingest import (
    service_from_observations,
    upsert_current_members,
)
from palegislature_spark.pipelines import html_extract as hx
from palegislature_spark.pipelines import ingest
from palegislature_spark.sources.merge import upsert_parquet

PageSource = Callable[[list[str]], list[tuple[str, str]]]


def session_id(year: Column, chamber: Column, index: Column) -> Column:
    return (year * 100 + chamber * 10 + index).cast("long")


def day_id(date: Column, chamber: Column) -> Column:
    return (
        (F.year(date) * 10000 + F.month(date) * 100 + F.dayofmonth(date)) * 10
        + chamber
    ).cast("long")


def roll_id(session: Column, number: Column) -> Column:
    return (session * 1000 + number).cast("long")


def _fetch(urls: DataFrame, source: PageSource, page_type: str) -> DataFrame:
    return hx.extract_pages(ingest.fetch_pages(urls, source), page_type)


def _read(spark: SparkSession, root: str, table: str) -> DataFrame | None:
    try:
        return spark.read.parquet(f"{root}/{table}")
    except Exception:  # noqa: BLE001 — table not created yet
        return None


def run_sessions_stage(
    spark: SparkSession, root: str, urls: DataFrame, source: PageSource
) -> None:
    """Stage 1 (``crawl.py:675-686``): session pages -> sessions +
    session_days upserts."""
    pages = _fetch(urls, source, "session")
    sessions_raw, days_raw = ingest.parse_session_pages(pages)
    sessions = sessions_raw.select(
        session_id(F.col("year"), F.col("chamber"), F.col("session_index")).alias("id"),
        "chamber",
        "year",
        "session_index",
        "name",
        "last_crawl",
    )
    upsert_parquet(spark, f"{root}/sessions", sessions, ["id"])
    days = days_raw.select(
        day_id(F.col("date"), F.col("chamber")).alias("id"),
        session_id(F.col("year"), F.col("chamber"), F.col("session_index")).alias(
            "session_id"
        ),
        "date",
        F.lit(None).cast("timestamp").alias("last_crawl"),
    )
    # a day's own crawl stamp is set by stage 2; re-crawls must not
    # reset it, so existing rows win on conflict (version_col absent
    # => update beats existing; here we merge the other way)
    existing = _read(spark, root, "session_days")
    if existing is not None:
        days = days.join(existing.select("id"), "id", "left_anti")
    upsert_parquet(spark, f"{root}/session_days", days, ["id"])


def run_days_stage(
    spark: SparkSession,
    root: str,
    source: PageSource,
    url_of_day: Callable[[Column], Column],
    limit: int = 100,
) -> None:
    """Stage 2 (``crawl.py:688-692``): uncrawled days -> floor-votes
    pages -> roll_calls upserts; day last_crawl set.

    ``url_of_day`` builds the page URL from the day id column — the
    work-queue context the extractor reads back (html_extract docs).
    """
    from palegislature_spark.sources.queue import work_queue

    days = _read(spark, root, "session_days")
    todo = work_queue(days, ["date"], limit).select(
        url_of_day(F.col("id")).alias("url"), F.col("id")
    )
    pages = _fetch(todo.select("url"), source, "day")
    rolls_raw = ingest.parse_day_pages(pages)
    rolls = rolls_raw.select(
        roll_id(
            session_id(
                F.col("session_year"), F.col("chamber"), F.col("session_index")
            ),
            F.col("number"),
        ).alias("id"),
        "day_id",
        "session_year",
        "session_index",
        "chamber",
        "number",
        "name",
        F.lit(None).cast("timestamp").alias("stamp"),
        F.lit(None).cast("timestamp").alias("last_crawl"),
    )
    existing = _read(spark, root, "roll_calls")
    if existing is not None:
        rolls = rolls.join(existing.select("id"), "id", "left_anti")
    upsert_parquet(spark, f"{root}/roll_calls", rolls, ["id"])

    # mark the crawled days
    crawled = rolls_raw.select("day_id").distinct()
    stamp = pages.agg(F.max("fetched_at").alias("__ts"))
    marked = (
        days.join(F.broadcast(crawled.withColumnRenamed("day_id", "id")), "id", "left_semi")
        .crossJoin(F.broadcast(stamp))
        .select("id", "session_id", "date", F.col("__ts").alias("last_crawl"))
    )
    upsert_parquet(spark, f"{root}/session_days", marked, ["id"])


def run_rolls_stage(
    spark: SparkSession,
    root: str,
    source: PageSource,
    url_of_roll: Callable[[Column, Column], Column],
    limit: int = 100,
) -> None:
    """Stage 3 (``crawl.py:694-697``): uncrawled rolls -> vote pages ->
    votes upserts + roll stamps."""
    from palegislature_spark.sources.queue import work_queue

    rolls = _read(spark, root, "roll_calls")
    days = _read(spark, root, "session_days").select(
        F.col("id").alias("day_id"), F.col("session_id").alias("__sid")
    )
    todo = (
        work_queue(rolls, ["id"], limit)
        .join(F.broadcast(days), "day_id")
        .select(url_of_roll(F.col("__sid"), F.col("id")).alias("url"))
    )
    pages = _fetch(todo, source, "roll")
    votes, stamps = ingest.parse_roll_pages(pages)
    upsert_parquet(spark, f"{root}/votes", votes, ["roll_id", "name"])
    updates = stamps.select(
        "id", F.col("stamp").alias("__stamp"), F.col("last_crawl").alias("__lc")
    )
    stamped = rolls.join(F.broadcast(updates), "id", "left").select(
        "id",
        "day_id",
        "session_year",
        "session_index",
        "chamber",
        "number",
        "name",
        F.coalesce("__stamp", "stamp").alias("stamp"),
        F.coalesce("__lc", "last_crawl").alias("last_crawl"),
    )
    upsert_parquet(spark, f"{root}/roll_calls", stamped, ["id"])


def run_member_stage(
    spark: SparkSession,
    root: str,
    urls: DataFrame,
    source: PageSource,
    chamber: int,
    resolutions: DataFrame | None = None,
) -> DataFrame:
    """Stage 4 (``crawl.py:699-734``): current member-list pages ->
    members + service upserts. Returns the violations DataFrame (Q1 —
    the reference exits; here callers gate on it)."""
    pages = _fetch(urls, source, "current_roll")
    _crawl, obs = ingest.parse_current_roll_pages(pages, resolutions)
    members = _read(spark, root, "members")
    if members is None:
        members = spark.createDataFrame(
            [],
            schema="id long, house_archive_id long, house_current_id long, "
            "senate_archive_id long, senate_current_id long, first string, "
            "middle string, last string, suffix string, dob date, last_crawl timestamp",
        )
    members_out, member_map, violations = upsert_current_members(
        members, obs, chamber
    )
    upsert_parquet(spark, f"{root}/members", members_out, ["id"])
    service = service_from_observations(obs, member_map, chamber)
    upsert_parquet(
        spark, f"{root}/service", service, ["member_id", "year", "chamber"]
    )
    return violations


def run_bio_stage(
    spark: SparkSession, root: str, urls: DataFrame, source: PageSource
) -> DataFrame:
    """Stage 5 (``crawl.py:736-738``): bio pages -> service history +
    dob + member last_crawl. Returns the weird-office violations."""
    pages = _fetch(urls, source, "bio")
    service, member_updates, violations = ingest.parse_bio_pages(pages)
    upsert_parquet(
        spark, f"{root}/service", service, ["member_id", "year", "chamber"]
    )
    members = _read(spark, root, "members")
    updates = member_updates.select(
        "id", F.col("dob").alias("__dob"), F.col("last_crawl").alias("__lc")
    )
    patched = members.join(F.broadcast(updates), "id", "left").select(
        "id",
        "house_archive_id",
        "house_current_id",
        "senate_archive_id",
        "senate_current_id",
        "first",
        "middle",
        "last",
        "suffix",
        F.coalesce("__dob", "dob").alias("dob"),
        F.coalesce("__lc", "last_crawl").alias("last_crawl"),
    )
    upsert_parquet(spark, f"{root}/members", patched, ["id"])
    return violations
