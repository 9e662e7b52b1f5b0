"""Crawl orchestration (pipelines/crawl.py): the five reference
stages as jobs over a parquet store, including work-queue drain and
re-run idempotence (``crawl.py:639-738`` semantics)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from palegislature_spark.pipelines import crawl
from palegislature_spark.pipelines.ingest import stored_page_source
from palegislature_spark.pipelines.fixture_pages import DAY_ID, PAGES, ROLL_ID

SOURCE = stored_page_source(PAGES)


from palegislature_spark.pipelines.fixture_pages import (  # noqa: E402
    url_of_day as _url_of_day,
    url_of_roll as _url_of_roll,
)


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crawl_job_store"))
    session_urls = spark.createDataFrame(
        [("https://x/SessionDays.cfm?Chamber=H",)], "url string"
    )
    crawl.run_sessions_stage(spark, root, session_urls, SOURCE)
    crawl.run_days_stage(spark, root, SOURCE, _url_of_day)
    crawl.run_rolls_stage(spark, root, SOURCE, _url_of_roll)
    member_urls = spark.createDataFrame(
        [("https://x/mbrList.cfm?body=H&SessYear=2019",)], "url string"
    )
    v1 = crawl.run_member_stage(spark, root, member_urls, SOURCE, chamber=1)
    assert v1.count() == 0
    bio_urls = spark.createDataFrame(
        [("https://x/bio.cfm?member_id=1&chamber=1",)], "url string"
    )
    v2 = crawl.run_bio_stage(spark, root, bio_urls, SOURCE)
    assert v2.count() == 0
    return root


def test_store_assembled(spark, store):
    assert spark.read.parquet(f"{store}/sessions").count() == 1
    [day] = spark.read.parquet(f"{store}/session_days").collect()
    assert day.id == DAY_ID and day.last_crawl is not None  # stage 2 marked
    [roll] = spark.read.parquet(f"{store}/roll_calls").collect()
    assert roll.id == ROLL_ID
    assert roll.stamp == dt.datetime(2019, 6, 1, 10, 0)
    assert spark.read.parquet(f"{store}/votes").count() == 3
    members = spark.read.parquet(f"{store}/members")
    assert members.count() == 3
    assert members.filter("dob IS NOT NULL").count() == 1  # bio backfill
    # 3 members x {2019, 2020} + Smith bio 2017-2018
    assert spark.read.parquet(f"{store}/service").count() == 8


def test_work_queue_drained_and_rerun_idempotent(spark, store):
    from palegislature_spark.sources.queue import work_queue

    days = spark.read.parquet(f"{store}/session_days")
    assert work_queue(days, ["date"], 10).count() == 0  # nothing left

    before = {
        t: spark.read.parquet(f"{store}/{t}").count()
        for t in ("sessions", "session_days", "roll_calls", "votes", "members", "service")
    }
    # stages 2-3 re-run: queues are empty, store must not change
    crawl.run_days_stage(spark, store, SOURCE, _url_of_day)
    crawl.run_rolls_stage(spark, store, SOURCE, _url_of_roll)
    after = {
        t: spark.read.parquet(f"{store}/{t}").count()
        for t in ("sessions", "session_days", "roll_calls", "votes", "members", "service")
    }
    assert after == before
