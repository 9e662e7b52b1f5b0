"""Inverse matrix loader — published vote_data CSV back to snowflake.

The reference publishes one CSV per (year, chamber) with a 3-header /
3-column contract (``README.md:11-28``, ``dump.py:82-101``): header
row Name/Number/Date + one display-name column per legislator,
optional District and Party rows, then one row per roll call with
letter cells (Y/N/X/E, blank = no record; a stamp without a time on
the source page is exported as the bare date).

``load_matrix_csv`` parses one such file back into the six snowflake
DataFrames so the matrix pipeline can be driven from a published
artifact — the round-trip (load -> ``pipelines.export_matrices`` ->
byte-identical file) is the fidelity gate for the export contract
(tests/test_pipelines.py).  Member identity is synthetic (column
position); the display string rides in ``last`` so the exporter's
``concat_ws`` display rebuild reproduces it verbatim.

The file is driver-parsed: a published matrix is export-sized by
contract (<=~1.6k rolls x ~210 legislators), the same bound the
exporter's per-group collect relies on.
"""

from __future__ import annotations

import csv
import datetime as dt

from pyspark.sql import SparkSession

from palegislature_spark import schemas
from palegislature_spark.functions.codecs import VOTE_LETTERS

_CRAWLED = dt.datetime(2020, 1, 1)


def load_matrix_csv(spark: SparkSession, path: str, year: int, chamber: int):
    """Parse one published vote_data CSV into snowflake DataFrames.

    Returns a dict with keys members, service, sessions,
    session_days, roll_calls, votes (schemas.SNOWFLAKE shapes).
    ``last_crawl`` columns are stamped so the completeness gate
    (pipelines/status.py) sees the group as exported-complete.
    """
    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    if not rows or rows[0][:3] != ["Name", "Number", "Date"]:
        raise ValueError(f"{path}: not a vote_data matrix (header row)")
    names = rows[0][3:]
    n = len(names)
    districts: list[str] = [""] * n
    parties: list[str] = [""] * n
    i = 1
    if i < len(rows) and rows[i][0] == "District":
        districts = rows[i][3:]
        i += 1
    if i < len(rows) and rows[i][0] == "Party":
        parties = rows[i][3:]
        i += 1
    roll_rows = rows[i:]

    members = [
        # display string in `last` (sole non-null name part) so the
        # exporter's concat_ws(first, middle, last, suffix) rebuilds
        # it exactly
        (j + 1, None, None, None, None, None, None, names[j], None, None, None)
        for j in range(n)
    ]
    service = [
        (
            j + 1,
            year,
            chamber,
            int(districts[j]) if districts[j] else None,
            parties[j] or None,
        )
        for j in range(n)
    ]
    sessions = [(1, chamber, year, 0, None, _CRAWLED)]

    # One day ENTITY per emitted day block: the published corpus
    # contains repeated-date day groups (the same calendar day crawled
    # under two sessions — e.g. 2010/House.csv emits the 2010-05-03
    # block twice, back to back), and the exporter keeps equal-date
    # day entities as separate insertion-ordered blocks, so collapsing
    # by date string would merge what the reference keeps apart.  The
    # flat file does not encode the entity boundary; it is
    # reconstructed from the two signals a block break leaves behind:
    # the date changing, or the roll number not increasing (numbers
    # are sequential within a day's emission, so a restart marks the
    # second copy).  A false split inside a stamp-sorted day is
    # harmless — concatenating two sorted sub-blocks that share the
    # sort boundary reproduces the same row order — and the
    # whole-corpus round-trip test pins that empirically.
    session_days = []
    roll_calls = []
    votes = []
    prev_day: str | None = None
    prev_number: int | None = None
    day_id = 0
    for k, row in enumerate(roll_rows):
        name, number, stamp_s = row[0], int(row[1]), row[2]
        day_s = stamp_s[:10]
        if day_s != prev_day or (prev_number is not None and number <= prev_number):
            prev_day = day_s
            day_id += 1
            session_days.append(
                (day_id, 1, dt.date.fromisoformat(day_s), _CRAWLED)
            )
        prev_number = number
        # time omitted on the source page -> bare date in the file
        # (README.md:28); reload it as a NULL stamp
        stamp = (
            dt.datetime.fromisoformat(stamp_s) if len(stamp_s) > 10 else None
        )
        roll_id = k + 1
        roll_calls.append(
            (roll_id, day_id, year, 0, chamber, number, name, stamp, _CRAWLED)
        )
        for j, letter in enumerate(row[3:]):
            if letter:
                votes.append((1, roll_id, names[j], VOTE_LETTERS[letter], j + 1))

    data = {
        "members": members,
        "service": service,
        "sessions": sessions,
        "session_days": session_days,
        "roll_calls": roll_calls,
        "votes": votes,
    }
    return {
        name: spark.createDataFrame(rows_, schemas.SNOWFLAKE[name])
        for name, rows_ in data.items()
    }
