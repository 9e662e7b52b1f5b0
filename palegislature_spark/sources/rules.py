"""YAML rulebook source (S10) — the ``edits.yaml`` schema as DataFrames.

Rule shapes (``apply_edits.py:12-88``, ``edits.yaml``):
  * integer year keys -> {chamber name -> {last or "First Last":
    null=remove | anything=add}} service edits;
  * 'Votes' -> {before: after} global renames or {before: {start,
    stop, name}} time-windowed renames;
  * 'Rename' -> [{from: {id_field: value}, to: {field: value}}].

Config is driver-side tiny; every resulting DataFrame broadcasts.
"""

from __future__ import annotations

import datetime as dt

import yaml
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_CHAMBERS = {"house": 1, "senate": 2}


def load_edits(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def service_rules(spark: SparkSession, edits: dict) -> DataFrame:
    """(year, chamber, last, first, action) rows from year-keyed edits."""
    rows = []
    for key, per_chamber in edits.items():
        if not isinstance(key, int):
            continue
        for chamber_s, by_last in (per_chamber or {}).items():
            chamber = _CHAMBERS[chamber_s.lower()]
            for last, edit in (by_last or {}).items():
                first = None
                if " " in last:
                    first, last = last.split(" ", 1)
                action = "remove" if edit is None else "add"
                rows.append((key, chamber, last, first, action))
    schema = T.StructType(
        [
            T.StructField("year", T.IntegerType()),
            T.StructField("chamber", T.IntegerType()),
            T.StructField("last", T.StringType()),
            T.StructField("first", T.StringType()),
            T.StructField("action", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def vote_rename_rules(spark: SparkSession, edits: dict) -> DataFrame:
    """(before, after, start, stop) rows from the 'Votes' section.

    Date-valued windows become midnight timestamps, preserving the
    reference's strict string comparison semantics
    (``apply_edits.py:66``).
    """
    rows = []
    for before, v in (edits.get("Votes") or {}).items():
        if isinstance(v, str):
            rows.append((before, v, None, None))
        else:
            start = _as_ts(v["start"])
            stop = _as_ts(v["stop"])
            rows.append((before, v["name"], start, stop))
    schema = T.StructType(
        [
            T.StructField("before", T.StringType()),
            T.StructField("after", T.StringType()),
            T.StructField("start", T.TimestampType()),
            T.StructField("stop", T.TimestampType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def member_rename_rules(spark: SparkSession, edits: dict) -> DataFrame:
    """(key_field, key_value, first, middle, last, suffix) rows."""
    rows = []
    for d in edits.get("Rename") or []:
        (key_field, key_value), = d["from"].items()
        to = d["to"]
        rows.append(
            (
                key_field,
                int(key_value),
                to.get("first"),
                to.get("middle"),
                to.get("last"),
                to.get("suffix"),
            )
        )
    schema = T.StructType(
        [
            T.StructField("key_field", T.StringType()),
            T.StructField("key_value", T.LongType()),
            T.StructField("first", T.StringType()),
            T.StructField("middle", T.StringType()),
            T.StructField("last", T.StringType()),
            T.StructField("suffix", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _as_ts(v) -> dt.datetime:
    if isinstance(v, dt.datetime):
        return v
    if isinstance(v, dt.date):
        return dt.datetime(v.year, v.month, v.day)
    return dt.datetime.fromisoformat(str(v))
