"""Pipeline tests: status gating, matrix export (golden CSV),
merge-by-key writer, rulebook source, work queues."""

from __future__ import annotations

import datetime as dt
import pathlib

import pytest

from palegislature_spark import pipelines, sources
from pyspark.sql import functions as F
from tests import snowflake_fixture
from tests.conftest import rows

GOLDEN = pathlib.Path(__file__).parent / "golden" / "2019_House.csv"


@pytest.fixture(scope="module")
def snow(spark):
    return snowflake_fixture.build(spark)


def test_crawl_statuses(spark, snow):
    got = rows(
        pipelines.crawl_statuses(
            snow["sessions"], snow["session_days"], snow["roll_calls"]
        ),
        "year",
        "chamber",
        "status",
    )
    assert got == [(2019, 1, "complete")]

    # poke a hole: uncrawled day -> days missing
    days2 = snow["session_days"].withColumn(
        "last_crawl",
        F.when(F.col("id") == 201, F.lit(None).cast("timestamp")).otherwise(
            F.col("last_crawl")
        ),
    )
    got = rows(
        pipelines.crawl_statuses(snow["sessions"], days2, snow["roll_calls"]),
        "status",
    )
    assert got == [("days missing",)]


def test_ordered_rolls_stamp_fallback(snow):
    got = (
        pipelines.ordered_rolls(
            snow["sessions"], snow["session_days"], snow["roll_calls"]
        )
        .orderBy("day_date", F.col("ord_stamp").asc_nulls_first(), "ord_id")
        .collect()
    )
    # day 200 has a missing stamp -> whole day ordered by id, missing
    # stamp displays as the day date
    assert [r["roll_id"] for r in got] == [300, 301, 302]
    assert got[0]["disp_stamp"] == "2019-06-01 10:00:00"
    assert got[1]["disp_stamp"] == "2019-06-01"  # date fallback
    assert got[0]["ord_stamp"] is None and got[0]["ord_id"] == 300


def test_golden_matrix_export(spark, snow, tmp_path):
    """Full pipeline: dedup -> match -> backfill -> export; compare to
    the committed golden CSV byte-for-byte."""
    from palegislature_spark import er

    members2, service2, _ = er.merge_members(snow["members"], snow["service"])
    matches = er.match_vote_names(
        snow["votes"], snow["roll_calls"], snow["session_days"], members2, service2
    )
    years = er.vote_names.roll_years(snow["roll_calls"], snow["session_days"])
    votes2 = er.backfill_member_ids(snow["votes"], matches, years)

    paths = pipelines.export_matrices(
        votes2,
        snow["roll_calls"],
        snow["session_days"],
        snow["sessions"],
        members2,
        service2,
        str(tmp_path),
    )
    assert [p.endswith("2019/House.csv") for p in paths] == [True]
    produced = pathlib.Path(paths[0]).read_text()
    assert produced == GOLDEN.read_text()


def test_merge_by_key(spark):
    existing = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], ["id", "v", "x"]
    )
    updates = spark.createDataFrame(
        [(2, "B", 21), (3, "c", 30)], ["id", "v", "x"]
    )
    got = rows(sources.merge_by_key(existing, updates, ["id"]), "id", "v", "x")
    assert got == [(1, "a", 10), (2, "B", 21), (3, "c", 30)]


def test_upsert_parquet_partition_discipline(spark, tmp_path):
    path = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [(2019, 1, "a"), (2020, 2, "b")], ["year", "id", "v"]
    )
    sources.upsert_parquet(spark, path, b1, keys=["year", "id"], partition_cols=["year"])
    b2 = spark.createDataFrame(
        [(2020, 2, "B2"), (2020, 3, "c")], ["year", "id", "v"]
    )
    sources.upsert_parquet(spark, path, b2, keys=["year", "id"], partition_cols=["year"])
    got = rows(spark.read.parquet(path), "year", "id", "v")
    assert got == [(2019, 1, "a"), (2020, 2, "B2"), (2020, 3, "c")]


def test_overwrite_updates(spark):
    fact = spark.createDataFrame(
        [(1, "SMITH", None), (2, "DOE", 7)], "roll int, name string, member_id int"
    )
    fixes = spark.createDataFrame([("SMITH", 1)], "name string, member_id int")
    got = rows(
        sources.overwrite_updates(fact, fixes, ["name"], ["member_id"]),
        "roll",
        "member_id",
    )
    assert got == [(1, 1), (2, 7)]


def test_rules_from_yaml(spark, tmp_path):
    y = tmp_path / "edits.yaml"
    y.write_text(
        """
2009:
  House:
    Hahn:
    Mary Smith:
  Senate:
    Brewster:
Votes:
  WHITE DONALD: WHITE, DONALD
  KELLER:
    start: 2019-09-16
    stop: 2019-12-31
    name: KELLER, M. K.
Rename:
- from: {house_current_id: 1745}
  to: {first: Donald}
"""
    )
    edits = sources.load_edits(str(y))
    svc = rows(sources.service_rules(spark, edits), "year", "chamber", "last", "first", "action")
    assert svc == [
        (2009, 1, "Hahn", None, "remove"),
        (2009, 1, "Smith", "Mary", "remove"),
        (2009, 2, "Brewster", None, "remove"),
    ]
    vr = rows(sources.vote_rename_rules(spark, edits), "before", "after", "start")
    assert vr == [
        ("KELLER", "KELLER, M. K.", dt.datetime(2019, 9, 16)),
        ("WHITE DONALD", "WHITE, DONALD", None),
    ]
    mr = rows(sources.member_rename_rules(spark, edits), "key_field", "key_value", "first")
    assert mr == [("house_current_id", 1745, "Donald")]


def test_work_queue_and_staleness(spark):
    ts = dt.datetime
    df = spark.createDataFrame(
        [
            (1, None),
            (2, ts(2020, 1, 1)),
            (3, None),
            (4, ts(2020, 6, 1)),
        ],
        "id long, last_crawl timestamp",
    )
    q = rows(sources.work_queue(df, ["id"], limit=1), "id")
    assert q == [(1,)]
    stale = rows(
        sources.stale_items(df, dt.timedelta(days=30), ts(2020, 6, 15)), "id"
    )
    assert stale == [(1,), (2,), (3,)]


REFERENCE_ROOT = pathlib.Path("/root/reference/vote_data")


@pytest.mark.skipif(not REFERENCE_ROOT.exists(), reason="reference corpus absent")
@pytest.mark.parametrize(
    ("year", "chamber", "fname"),
    [
        (2019, 1, "House.csv"),   # every roll stamped; 32 duplicate
                                  # (day, stamp) pairs -> stable-sort ties
        (2010, 1, "House.csv"),   # MIXED: 298 of 1173 rolls date-only ->
                                  # per-day any-missing id-order fallback
        (2008, 2, "Senate.csv"),  # all rolls date-only; Senate chamber name
    ],
)
def test_real_corpus_matrix_roundtrip(spark, tmp_path, year, chamber, fname):
    """Fidelity gate against the real published corpus: parse a real
    reference CSV back into snowflake rows, re-export it, and require
    byte identity.  Unlike the self-generated golden fixture, this
    catches a shared misunderstanding of the reference format (column
    order, stamp-fallback row order, tie order of duplicate stamps,
    blank-vs-X cells, quoting, CRLF line endings) — across all three
    stamp regimes the published corpus contains."""
    ref = REFERENCE_ROOT / str(year) / fname
    snow = sources.load_matrix_csv(spark, str(ref), year=year, chamber=chamber)
    paths = pipelines.export_matrices(
        snow["votes"],
        snow["roll_calls"],
        snow["session_days"],
        snow["sessions"],
        snow["members"],
        snow["service"],
        str(tmp_path),
    )
    assert [p.endswith(f"{year}/{fname}") for p in paths] == [True]
    assert pathlib.Path(paths[0]).read_bytes() == ref.read_bytes()


def test_upsert_parquet_rowlevel_rewrites_only_affected_files(spark, tmp_path):
    import os

    path = str(tmp_path / "t")
    # 4 files, ids range-clustered so update keys hit exactly one file
    base = spark.createDataFrame(
        [(i, f"v{i}", 1.0) for i in range(40)], "id long, v string, x double"
    ).repartitionByRange(4, "id")
    base.write.parquet(path)
    before = {f for f in os.listdir(path) if f.startswith("part-")}
    assert len(before) == 4

    updates = spark.createDataFrame(
        [(3, "V3", 2.0), (7, "V7", 2.0), (99, "new", 2.0)],
        "id long, v string, x double",
    )
    stats = sources.upsert_parquet_rowlevel(spark, path, updates, ["id"])
    assert stats["files_total"] == 4
    assert stats["files_rewritten"] == 1  # ids 3 and 7 share a range file

    # snapshot read is correct immediately; the superseded original is
    # retained one generation for in-flight readers
    got_snap = {
        r["id"]: r["v"] for r in sources.read_snapshot(spark, path).collect()
    }
    assert len(got_snap) == 41 and got_snap[3] == "V3"

    # vacuum retires it physically; plain directory reads then agree
    assert sources.vacuum(spark, path) == 1
    after = {f for f in os.listdir(path) if f.startswith("part-")}
    # untouched files still present under their original names
    assert len(before & after) == 3

    got = {r["id"]: (r["v"], r["x"]) for r in spark.read.parquet(path).collect()}
    assert len(got) == 41
    assert got[3] == ("V3", 2.0) and got[7] == ("V7", 2.0)
    assert got[99] == ("new", 2.0)
    assert got[5] == ("v5", 1.0)  # same-file neighbor survived the rewrite
    assert got[20] == ("v20", 1.0)  # untouched-file row intact


def test_upsert_parquet_rowlevel_first_write_and_pure_insert(spark, tmp_path):
    import os

    path = str(tmp_path / "t2")
    u1 = spark.createDataFrame([(1, "a", 1.0)], "id long, v string, x double")
    stats = sources.upsert_parquet_rowlevel(spark, path, u1, ["id"])
    assert stats == {
        "files_total": 0,
        "files_rewritten": 0,
        "rows_written": 1,
        "generation": 0,
    }

    before = {f for f in os.listdir(path) if f.startswith("part-")}
    u2 = spark.createDataFrame([(2, "b", 1.0)], "id long, v string, x double")
    stats = sources.upsert_parquet_rowlevel(spark, path, u2, ["id"])
    assert stats["files_rewritten"] == 0  # no key overlap: nothing rewritten
    after = {f for f in os.listdir(path) if f.startswith("part-")}
    assert before <= after  # originals untouched, new file appended
    got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert got == [(1, "a", 1.0), (2, "b", 1.0)]


def test_upsert_rowlevel_snapshot_isolation_concurrent_reader(spark, tmp_path):
    """A reader resolving the manifest must only ever observe COMPLETE
    committed generations while merges run — never a half-published
    file set, duplicate keys, or a dipped row count (the SQLite
    transaction guarantee the reference relied on)."""
    import threading

    path = str(tmp_path / "iso")
    base = spark.createDataFrame(
        [(i, "v0") for i in range(40)], "id long, v string"
    ).repartitionByRange(4, "id")
    # plain-Spark bootstrap (no manifest yet): the first merge must
    # adopt the legacy dataset and commit generation 1
    base.write.parquet(path)

    valid_counts = {40, 45, 50, 55, 60}
    observed, errors = [], []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                n = sources.read_snapshot(spark, path).count()
                observed.append(n)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

    t = threading.Thread(target=reader)
    t.start()
    try:
        for g in range(4):
            # each merge UPDATES 10 existing keys (forcing file
            # rewrites) and INSERTS 5 new ones (count moves 40->45...)
            lo = 40 + g * 5
            upd = spark.createDataFrame(
                [(i, f"g{g}") for i in range(0, 10)]
                + [(i, f"g{g}") for i in range(lo, lo + 5)],
                "id long, v string",
            )
            stats = sources.upsert_parquet_rowlevel(spark, path, upd, ["id"])
            assert stats["files_rewritten"] >= 1
    finally:
        stop.set()
        t.join()

    assert not errors, errors[:3]
    assert observed, "reader never completed a single read"
    bad = [n for n in observed if n not in valid_counts]
    assert not bad, f"inconsistent snapshots observed: {sorted(set(bad))}"
    assert sources.read_snapshot(spark, path).count() == 60
    # after vacuum, a plain directory read agrees too
    sources.vacuum(spark, path)
    assert spark.read.parquet(path).count() == 60


def test_upsert_rowlevel_rejects_partitioned_target(spark, tmp_path):
    path = str(tmp_path / "hive")
    spark.createDataFrame(
        [(1, 2020, "a")], "id long, year int, v string"
    ).write.partitionBy("year").parquet(path)
    upd = spark.createDataFrame([(1, 2020, "b")], "id long, year int, v string")
    with pytest.raises(ValueError, match="hive-partitioned"):
        sources.upsert_parquet_rowlevel(spark, path, upd, ["id"])


def test_upsert_rowlevel_rejects_schema_mismatch(spark, tmp_path):
    path = str(tmp_path / "mismatch")
    spark.createDataFrame(
        [(1, "a", 9.0)], "id long, v string, extra double"
    ).write.parquet(path)
    upd = spark.createDataFrame([(1, "b")], "id long, v string")
    with pytest.raises(ValueError, match="column mismatch"):
        sources.upsert_parquet_rowlevel(spark, path, upd, ["id"])


def test_curate_documents_funnel(spark):
    from palegislature_spark import pipelines as P

    # 40 words, 4 stopwords (ratio 0.1), fully distinct
    good = "the a of and " + " ".join(f"w{i}" for i in range(36))
    near = good.replace(" w17 ", " x17 ", 1)                  # one word changed
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, good),                                        # exact copy of 1
            (3, near),                                        # near-dup of 1
            (4, "too short"),                                 # fails min_words
            (5, " ".join(["the"] * 30)),                      # stopword-heavy
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in P.curate_documents(docs).collect()}
    assert got == {
        1: "kept",
        2: "exact_dup",
        3: "near_dup",
        4: "low_quality",
        5: "low_quality",
    }


def test_curate_documents_null_and_empty_text(spark):
    """NULL text makes every quality signal NULL; without the coalesce
    the NULL q_ok slid past all when() branches and the row surfaced
    as a 'kept' survivor with NULL n_words. Both NULL and empty text
    must gate as low_quality."""
    from palegislature_spark import pipelines as P

    good = "the a of and " + " ".join(f"w{i}" for i in range(36))
    docs = spark.createDataFrame(
        [(1, good), (2, None), (3, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in P.curate_documents(docs).collect()}
    assert got == {1: "kept", 2: "low_quality", 3: "low_quality"}


@pytest.mark.skipif(not REFERENCE_ROOT.exists(), reason="reference corpus absent")
def test_whole_corpus_roundtrip(spark, tmp_path):
    """Every published file (38 year x chamber matrices, 2007-2025)
    loads and re-exports byte-identically — the strongest available
    statement that the export pipeline implements the real contract,
    including repeated-date day blocks and both stamp regimes."""
    files = sorted(REFERENCE_ROOT.rglob("*.csv"))
    assert len(files) >= 38
    bad = []
    for i, f in enumerate(files):
        snow = sources.load_matrix_csv(
            spark, str(f), year=int(f.parent.name),
            chamber=1 if f.stem == "House" else 2,
        )
        out = tmp_path / str(i)
        paths = pipelines.export_matrices(
            snow["votes"], snow["roll_calls"], snow["session_days"],
            snow["sessions"], snow["members"], snow["service"], str(out),
        )
        if pathlib.Path(paths[0]).read_bytes() != f.read_bytes():
            bad.append(str(f))
    assert bad == []


def test_compact_files_binpacks_small_files(spark, tmp_path):
    """Micro-batch accretion -> many small files; compact_files must
    bin-pack them into few outputs, preserve the exact row set through
    read_snapshot, and no-op when nothing is gained."""
    import os

    path = str(tmp_path / "accrete")
    for i in range(6):
        batch = spark.createDataFrame(
            [(i * 10 + j, f"v{i}_{j}") for j in range(10)], "id long, v string"
        )
        sources.upsert_parquet_rowlevel(spark, path, batch, ["id"])
    n_small = len(
        [f for f in os.listdir(path) if f.startswith("part-")]
    )
    before_rows = sorted(tuple(r) for r in sources.read_snapshot(spark, path).collect())
    assert len(before_rows) == 60

    stats = sources.compact_files(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_compacted"] >= 2
    assert stats["files_written"] < stats["files_compacted"]
    after_rows = sorted(tuple(r) for r in sources.read_snapshot(spark, path).collect())
    assert after_rows == before_rows

    # compacted originals are retired one generation later, not leaked
    sources.vacuum(spark, path)
    live = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(live) == stats["files_written"]
    assert len(live) < n_small
    plain = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert plain == before_rows

    # 60 tiny rows pack into one file; a lone small file is never
    # "compacted" further — the second call must be a clean no-op
    assert stats["files_written"] == 1
    again = sources.compact_files(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert again["files_compacted"] == 0 and again["files_written"] == 0


def test_read_snapshot_time_travel(spark, tmp_path):
    """generation= pins a prior commit (window: last two generations);
    older pins raise with the retention explanation."""
    import pytest as _pytest

    path = str(tmp_path / "tt")
    for gen, rows_ in enumerate(
        ([(1, "a")], [(2, "b")], [(3, "c")]),
    ):
        sources.upsert_parquet_rowlevel(
            spark, path, spark.createDataFrame(rows_, "id long, v string"), ["id"]
        )
    latest = sorted(r["id"] for r in sources.read_snapshot(spark, path).collect())
    assert latest == [1, 2, 3]
    prev = sorted(
        r["id"]
        for r in sources.read_snapshot(spark, path, generation=1).collect()
    )
    assert prev == [1, 2]
    with _pytest.raises(ValueError, match="time-travel window"):
        sources.read_snapshot(spark, path, generation=0)


def test_compact_files_concurrent_reader(spark, tmp_path):
    """Compaction commits through the same manifest protocol as the
    merge: a snapshot reader looping while merges AND compactions
    interleave must never see a dipped or inflated row count."""
    import threading

    path = str(tmp_path / "compact_iso")
    for i in range(4):
        batch = spark.createDataFrame(
            [(i * 10 + j, "v") for j in range(10)], "id long, v string"
        )
        sources.upsert_parquet_rowlevel(spark, path, batch, ["id"])

    valid = {40, 50, 60}
    observed, errors = [], []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                observed.append(sources.read_snapshot(spark, path).count())
            except Exception as e:  # noqa: BLE001
                errors.append(e)

    t = threading.Thread(target=reader)
    t.start()
    try:
        for g in range(2):
            stats = sources.compact_files(
                spark, path, target_file_bytes=64 * 1024 * 1024
            )
            assert stats["files_compacted"] >= 2 or g > 0
            ins = spark.createDataFrame(
                [(100 + g * 10 + j, "n") for j in range(10)],
                "id long, v string",
            )
            sources.upsert_parquet_rowlevel(spark, path, ins, ["id"])
    finally:
        stop.set()
        t.join()

    assert not errors, errors[:3]
    assert observed
    bad = [n for n in observed if n not in valid]
    assert not bad, f"inconsistent snapshots observed: {sorted(set(bad))}"
    sources.vacuum(spark, path)
    assert spark.read.parquet(path).count() == 60


def test_snapshot_diff_classifies_changes(spark, tmp_path):
    """Generation diff on the manifest store: the (N-1, N) change set
    reports exactly the rows the last commit added / removed /
    updated, with before/after structs."""
    path = str(tmp_path / "diffable")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, s string, v long"
    )
    sources.upsert_parquet_rowlevel(spark, path, base, ["id"])  # gen 0
    upd = spark.createDataFrame(
        [(2, "b", 25), (4, "d", 40), (3, "c", 30)], "id long, s string, v long"
    )
    stats = sources.upsert_parquet_rowlevel(spark, path, upd, ["id"])  # gen 1
    assert stats["generation"] == 1

    diff = {
        r.id: r
        for r in sources.snapshot_diff(
            spark, path, ["id"], gen_a=0, gen_b=1
        ).collect()
    }
    # row 3 re-merged with identical values: unchanged, not reported;
    # row 1 untouched: absent
    assert set(diff) == {2, 4}
    assert diff[2].change == "updated"
    assert diff[2].before.v == 20 and diff[2].after.v == 25
    assert diff[4].change == "added"
    assert diff[4].before is None and diff[4].after.v == 40


def test_snapshot_diff_defaults_to_last_commit(spark, tmp_path):
    """Default-argument snapshot_diff must diff (N-1, N), not latest
    against itself; on a generation-0 dataset everything is 'added'."""
    path = str(tmp_path / "diffable_defaults")
    base = spark.createDataFrame([(1, 10), (2, 20)], "id long, v long")
    sources.upsert_parquet_rowlevel(spark, path, base, ["id"])  # gen 0
    gen0 = sources.snapshot_diff(spark, path, ["id"]).collect()
    assert {(r.id, r.change) for r in gen0} == {(1, "added"), (2, "added")}

    upd = spark.createDataFrame([(2, 25)], "id long, v long")
    sources.upsert_parquet_rowlevel(spark, path, upd, ["id"])  # gen 1
    d = sources.snapshot_diff(spark, path, ["id"]).collect()
    assert {(r.id, r.change) for r in d} == {(2, "updated")}


def test_rowlevel_interrupted_publish_never_half_merged(spark, tmp_path):
    """Crash between publish and commit (VERDICT r7 #6): a prior merge
    attempt died after moving its rewritten part files into the live
    directory but BEFORE committing the manifest. The orphans must be
    (a) invisible to read_snapshot immediately, and (b) swept — never
    committed as duplicates — by the next successful merge."""
    import os
    import shutil

    path = str(tmp_path / "tc")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "id long, v string"
    ).repartitionByRange(2, "id")
    sources.upsert_parquet_rowlevel(spark, path, base, ["id"])

    # simulate the crashed attempt: a fully-written rewrite of ids
    # 0..9 published into the live dir with NO commit
    crashed = str(tmp_path / "crashed_stage")
    spark.createDataFrame(
        [(i, "CRASHED") for i in range(10)], "id long, v string"
    ).coalesce(1).write.mode("overwrite").parquet(crashed)
    orphans = []
    for f in os.listdir(crashed):
        if f.startswith("part-"):
            shutil.copy(os.path.join(crashed, f), os.path.join(path, f))
            orphans.append(f)
    assert orphans

    # (a) snapshot readers never see the uncommitted files
    got = {r["id"]: r["v"] for r in sources.read_snapshot(spark, path).collect()}
    assert len(got) == 20 and got[3] == "v3"

    # (b) the next merge sweeps them and commits exactly its delta
    spark.catalog.refreshByPath(path)
    upd = spark.createDataFrame([(3, "V3")], "id long, v string")
    sources.upsert_parquet_rowlevel(spark, path, upd, ["id"])
    live = {f for f in os.listdir(path) if f.startswith("part-")}
    assert not (live & set(orphans)), "orphans survived the sweep"
    spark.catalog.refreshByPath(path)
    got = {r["id"]: r["v"] for r in sources.read_snapshot(spark, path).collect()}
    assert len(got) == 20 and got[3] == "V3" and got[7] == "v7"
    # no duplicate keys anywhere (the failure mode of a scan-based commit)
    ids = [r["id"] for r in sources.read_snapshot(spark, path).collect()]
    assert len(ids) == len(set(ids))


def test_rowlevel_legacy_bootstrap_then_crash_safe(spark, tmp_path):
    """A plain-Spark-written directory (no manifest) gets bootstrapped
    before the first managed merge publishes anything, so even the
    FIRST merge's crash window cannot leak uncommitted files."""
    path = str(tmp_path / "tl")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, v string"
    ).coalesce(1).write.parquet(path)
    stats = sources.upsert_parquet_rowlevel(
        spark, path, spark.createDataFrame([(1, "X")], "id long, v string"), ["id"]
    )
    assert stats["files_rewritten"] == 1
    from palegislature_spark.sources.merge import _read_manifest
    m = _read_manifest(spark, path)
    # bootstrap (gen 1) + merge commit (gen 2)
    assert m["generation"] == 2
    got = {r["id"]: r["v"] for r in sources.read_snapshot(spark, path).collect()}
    assert len(got) == 10 and got[1] == "X" and got[2] == "v2"


def test_upsert_parquet_repairs_interrupted_whole_dir_swap(spark, tmp_path):
    """Crash between rename(live -> trash) and rename(staging -> live)
    leaves NO live directory; the next call must finish the swap and
    expose the complete staged generation (never an unreadable or
    half-merged table)."""
    import os

    path = str(tmp_path / "ts")
    sources.upsert_parquet(
        spark,
        path,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        ["id"],
    )
    sources.upsert_parquet(
        spark,
        path,
        spark.createDataFrame([(2, "B2"), (3, "c")], "id long, v string"),
        ["id"],
    )
    # reconstruct the crash window from the post-swap state: current
    # live contents == what staging held; move live -> staging and
    # a stand-in old generation -> trash
    os.rename(path, path + ".__staging__")
    spark.createDataFrame([(9, "OLD")], "id long, v string").write.parquet(
        path + ".__old__"
    )
    assert not os.path.exists(path)

    spark.catalog.refreshByPath(path)
    sources.upsert_parquet(
        spark,
        path,
        spark.createDataFrame([(4, "d")], "id long, v string"),
        ["id"],
    )
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 4: "d"}
    assert not os.path.exists(path + ".__old__")
    assert not os.path.exists(path + ".__staging__")


def test_upsert_parquet_discards_incomplete_staging(spark, tmp_path):
    """A staging dir WITHOUT _SUCCESS is a mid-write crash: it must be
    discarded, never swapped in."""
    import os

    path = str(tmp_path / "ti")
    sources.upsert_parquet(
        spark,
        path,
        spark.createDataFrame([(1, "a")], "id long, v string"),
        ["id"],
    )
    staging = path + ".__staging__"
    spark.createDataFrame([(8, "BAD")], "id long, v string").write.parquet(staging)
    os.remove(os.path.join(staging, "_SUCCESS"))
    sources.upsert_parquet(
        spark,
        path,
        spark.createDataFrame([(2, "b")], "id long, v string"),
        ["id"],
    )
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "b"}


def test_curation_epoch_plan_invariants(spark):
    """The composed end-to-end pipeline (gate -> dedup -> decontam ->
    mixture draw -> global shuffle -> packing) in ONE plan: positions
    are an exact 1..N permutation, token offsets tile the packed
    stream gaplessly in position order, each surviving doc appears
    floor(rf) or floor(rf)+1 times (the deterministic draw), and no
    gated/dup/contaminated document reaches the epoch."""
    import math

    from palegislature_spark.catalog import load
    from palegislature_spark.operators.contamination import decontaminate
    from palegislature_spark.operators.sampling import hash_split
    from palegislature_spark.pipelines.curate import (
        curate_documents,
        curation_epoch_plan,
        mixture_repeat_factors,
    )

    docs = hash_split(
        load(spark, "/root/testdata/sf0.01", "documents"),
        "doc_id",
        {"train": 0.9, "val": 0.05, "test": 0.05},
    )
    train = docs.filter(F.col("split") != "test").drop("split")
    eval_df = docs.filter(F.col("split") == "test").drop("split")
    out = curation_epoch_plan(train, eval_df, budget=512).collect()
    assert out

    # 1..N permutation + gapless tiling
    by_pos = sorted(out, key=lambda r: r.position)
    assert [r.position for r in by_pos] == list(range(1, len(out) + 1))
    off = 0
    for r in by_pos:
        assert r.start_offset == off
        assert r.first_chunk == off // 512
        assert r.last_chunk == (off + r.n_tokens - 1) // 512
        off += r.n_tokens

    # exclusion: every id in the epoch is kept AND clean
    status = {
        r.doc_id: r.status for r in curate_documents(train).collect()
    }
    survivors = train.join(
        curate_documents(train).filter("status = 'kept'").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    contaminated = {
        r.doc_id
        for r in decontaminate(survivors, eval_df).filter("contaminated").collect()
    }
    for r in out:
        assert status[r.doc_id] == "kept" and r.doc_id not in contaminated

    # draw law: copies per doc in {floor(rf), floor(rf)+1}
    rf = {
        r.source: r.repeat_factor
        for r in mixture_repeat_factors(
            survivors.join(
                spark.createDataFrame(
                    [(d,) for d in contaminated] or [(-1,)], "doc_id long"
                ),
                "doc_id",
                "left_anti",
            )
        ).collect()
    }
    copies: dict = {}
    src_of: dict = {}
    for r in out:
        copies[r.doc_id] = copies.get(r.doc_id, 0) + 1
        src_of[r.doc_id] = r.source
    for did, k in copies.items():
        f = math.floor(rf[src_of[did]])
        assert k in (f, f + 1), (did, k, rf[src_of[did]])
