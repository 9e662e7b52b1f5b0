"""Declarative data-quality audit (operators/audit.py)."""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from palegislature_spark.operators import audit


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, status string, price double")


def test_audit_counts_planted_violations(spark):
    df = _mk(
        spark,
        [
            (1, "O", 10.0),
            (2, "F", -5.0),   # range violation
            (2, "X", 20.0),   # domain violation + duplicate key
            (None, "O", 0.0),  # null key + range violation (price <= 0)
        ],
    )
    res = audit.audit_scalar(
        df,
        [
            audit.Violation("t.k_complete", F.col("k").isNull()),
            audit.Violation("t.status_domain", ~F.col("status").isin("O", "F")),
            audit.Violation("t.price_positive", F.col("price") <= 0),
        ],
        unique_keys={"t.k_unique": ["k"]},
    )
    out = {r.constraint: r for r in res.collect()}
    assert out["t.k_complete"].violations == 1
    assert out["t.status_domain"].violations == 1
    assert out["t.price_positive"].violations == 2
    # 4 rows, distinct keys {1, 2, NULL->not counted by count_distinct}
    # => 4 - 2 = 2 "duplicate" rows (the NULL-key row is completeness's
    # finding, and it also shows up here — acceptable: a table with
    # NULL keys is not unique-keyed)
    assert out["t.k_unique"].violations == 2
    assert all(r.total == 4 for r in out.values())
    assert not out["t.k_complete"].passed
    assert set(out) == {
        "t.k_complete", "t.status_domain", "t.price_positive", "t.k_unique"
    }


def test_audit_all_green_passes(spark):
    df = _mk(spark, [(1, "O", 10.0), (2, "F", 5.0)])
    res = audit.audit_scalar(
        df,
        [audit.Violation("t.price_positive", F.col("price") <= 0)],
        unique_keys={"t.k_unique": ["k"]},
    )
    assert all(r.passed and r.violations == 0 for r in res.collect())


def test_audit_fk_orphans_and_null_exclusion(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    res = audit.audit_foreign_key("c.fk", child, "fk", parent, "pk").collect()
    assert len(res) == 1
    r = res[0]
    # the NULL-fk row is excluded (ANSI FK semantics); 99 is the orphan
    assert r.total == 3 and r.violations == 1 and not r.passed


def test_audit_scalar_is_single_scan(spark):
    """All row-local checks + uniqueness must compile to one aggregate
    over one scan — N constraints may not cost N passes. count_distinct
    adds an Expand inside the same scan, never a second file read."""
    df = _mk(spark, [(1, "O", 10.0)])
    res = audit.audit_scalar(
        df,
        [
            audit.Violation("a", F.col("k").isNull()),
            audit.Violation("b", F.col("price") <= 0),
        ],
        unique_keys={"u": ["k"]},
    )
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    )
    # "(n) Scan ..." headers appear once per node in the tree section
    scans = re.findall(r"\(\d+\) (?:Scan|LocalTableScan)", plan)
    assert len(scans) == 1, plan


def test_audit_union_sorted(spark):
    a = spark.createDataFrame(
        [("z.last", 0, 1, True)], "constraint string, violations long, total long, passed boolean"
    )
    b = spark.createDataFrame(
        [("a.first", 2, 3, False)], "constraint string, violations long, total long, passed boolean"
    )
    rows = audit.audit_union(a, b).collect()
    assert [r.constraint for r in rows] == ["a.first", "z.last"]


def test_category_drift_flags_shifted_column(spark):
    """Planted shift: 'status' flips distribution between batches,
    'prio' stays identical — exactly one column's categories drift.
    Melt must be single-scan (no self-union: one scan node)."""
    rows = (
        [(False, "A", "x")] * 8 + [(False, "B", "y")] * 2   # prev: A 80%
        + [(True, "A", "x")] * 2 + [(True, "B", "y")] * 8   # cur:  A 20%
    )
    df = spark.createDataFrame(rows, "cur boolean, status string, prio string")
    res = audit.category_drift(df, F.col("cur"), ["status", "prio"], threshold=0.3)
    out = {(r.column, r.category): r for r in res.collect()}
    a = out[("status", "A")]
    assert a.n_prev == 8 and a.n_cur == 2
    assert a.prev_share == 0.8 and a.cur_share == 0.2
    assert a.drifted
    assert out[("status", "B")].drifted
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    )
    scans = re.findall(r"\(\d+\) (?:Scan|LocalTableScan)", plan)
    assert len(scans) == 1, "melt must not rescan the input per column"


def test_category_drift_stable_column_not_flagged(spark):
    rows = (
        [(False, "A", "x")] * 5 + [(False, "B", "x")] * 5
        + [(True, "A", "x")] * 2 + [(True, "B", "x")] * 8
    )
    df = spark.createDataFrame(rows, "cur boolean, status string, prio string")
    res = audit.category_drift(df, F.col("cur"), ["status", "prio"], threshold=0.2)
    out = {(r.column, r.category): r for r in res.collect()}
    assert out[("status", "A")].drifted and out[("status", "B")].drifted
    assert not out[("prio", "x")].drifted  # 100% -> 100%, shift 0


def test_numeric_drift_flags_planted_shift(spark):
    """Planted numeric shift: 'val' moves from low bins to high bins
    between batches while 'stable' keeps an identical 80/20 split in
    both. Binned KS must flag exactly the shifted column, agree with
    the hand-computed statistic, and stay single-scan."""
    rows = (
        [(False, 5.0, 1.0)] * 8 + [(False, 95.0, 9.0)] * 2   # prev: val low-heavy
        + [(True, 95.0, 1.0)] * 8 + [(True, 5.0, 9.0)] * 2   # cur: val high-heavy
    )
    df = spark.createDataFrame(rows, "cur boolean, val double, stable double")
    res = audit.numeric_drift(
        df,
        F.col("cur"),
        {"val": (0.0, 100.0, 10), "stable": (0.0, 10.0, 10)},
        threshold_milli=300,
    )
    out = {r.column: r for r in res.collect()}
    v = out["val"]
    assert v.total_prev == 10 and v.total_cur == 10
    # val cdf at bin 0: prev 0.8, cur 0.2 -> KS sup = 0.6 > 0.3
    assert v.ks_stat == 0.6 and bool(v.drifted)
    s = out["stable"]
    # stable is 80% bin1 / 20% bin9 in BOTH batches -> KS 0
    assert s.ks_stat == 0.0 and not s.drifted
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    )
    scans = re.findall(r"\(\d+\) (?:Scan|LocalTableScan)", plan)
    assert len(scans) == 1, "melt must not rescan the input per column"


def test_numeric_drift_null_bin_and_clamping(spark):
    """NULLs land in bin -1 (a null-rate change IS drift); values
    outside [lo, hi) clamp into the edge bins instead of vanishing."""
    rows = (
        [(False, 5.0)] * 9 + [(False, None)] * 1        # prev: 10% null
        + [(True, 5.0)] * 4 + [(True, None)] * 4        # cur: 50% null
        + [(True, -99.0), (True, 999.0)]                # clamp to bins 0, 9
    )
    df = spark.createDataFrame(rows, "cur boolean, val double")
    out = audit.numeric_drift(
        df, F.col("cur"), {"val": (0.0, 100.0, 10)}, threshold_milli=300
    ).collect()[0]
    assert out.total_prev == 10 and out.total_cur == 10
    # cdf at null bin (-1): prev 0.1, cur 0.4 -> sup begins at 0.3;
    # at bin 0: prev 1.0, cur 0.9 (4 null + 5 in-bin + 1 clamped low)
    assert out.ks_stat == 0.3 and not out.drifted  # 0.3 > 0.3 is false
    assert bool(
        audit.numeric_drift(
            df, F.col("cur"), {"val": (0.0, 100.0, 10)}, threshold_milli=299
        ).collect()[0].drifted
    )


def test_numeric_drift_nan_routes_to_missing_bin(spark):
    """NaN lands in bin -1 alongside NULL (ADVICE r9): Spark's
    floor(NaN) otherwise casts to bin 0 silently — miscounted as
    low-bin mass AND divergent from the DuckDB oracle, whose CAST of
    NaN to INT errors. A NaN-rate change must register as drift the
    same way a null-rate change does."""
    nan = float("nan")
    rows = (
        [(False, 55.0)] * 9 + [(False, nan)] * 1        # prev: 10% NaN
        + [(True, 55.0)] * 5 + [(True, nan)] * 5        # cur: 50% NaN
    )
    df = spark.createDataFrame(rows, "cur boolean, val double")
    out = audit.numeric_drift(
        df, F.col("cur"), {"val": (0.0, 100.0, 10)}, threshold_milli=300
    ).collect()[0]
    # cdf at bin -1: prev 0.1, cur 0.5 -> ks 0.4 > 0.3 -> drifted.
    # If NaN fell into bin 0 instead, both cdfs would only diverge by
    # the same 0.4 but the -1 bin would read 0.1 vs 0.0 — the planted
    # rates below pin the -1-bin routing exactly.
    assert out.ks_stat == 0.4 and bool(out.drifted)
    binned = audit.numeric_bin_counts(
        df.filter("cur"), {"val": (0.0, 100.0, 10)}
    ).collect()
    by_bin = {r.bin: r.n for r in binned}
    assert by_bin[-1] == 5 and by_bin.get(0, 0) == 0


def test_numeric_drift_empty_batch_flags(spark):
    """A column with an all-empty previous batch reports ks 1.0 /
    drifted true (not NULL) — the zero-total rule; both-empty would
    be 0.0/false but cannot occur through the melt (every row lands
    in some bin)."""
    df = spark.createDataFrame(
        [(True, 1.0)] * 4, "cur boolean, val double"
    )
    out = audit.numeric_drift(
        df, F.col("cur"), {"val": (0.0, 10.0, 5)}, threshold_milli=300
    ).collect()[0]
    assert out.total_prev == 0 and out.total_cur == 4
    assert out.ks_stat == 1.0 and bool(out.drifted)


def _vec_df(spark, pts):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(pts, schema)


def test_embedding_drift_flags_planted_shift(spark):
    """The embedding leg of the drift-gate trio: a current generation
    whose mass abandons one frozen cluster flags drifted; an
    identically-distributed refresh reads tv 0.0."""
    import math

    def cluster(ids, angle):
        return [(i, [math.cos(angle + i * 1e-4), math.sin(angle + i * 1e-4)])
                for i in ids]

    # previous generation: two well-separated clusters, 10 vectors each
    prev = _vec_df(
        spark, cluster(range(10), 0.0) + cluster(range(10, 20), 2.5)
    )
    # drifted refresh: ALL mass in cluster A
    cur_shift = _vec_df(spark, cluster(range(100, 120), 0.0))
    rep = audit.embedding_drift(
        prev, cur_shift, n_lists=2, threshold_milli=100
    ).collect()
    assert len(rep) == 2
    assert all(bool(r.drifted) for r in rep)
    assert rep[0].tv_stat == 0.5  # half the mass moved cluster
    # identically-shaped refresh: same split, zero TV
    cur_same = _vec_df(
        spark, cluster(range(200, 210), 0.0) + cluster(range(210, 220), 2.5)
    )
    rep2 = audit.embedding_drift(
        prev, cur_same, n_lists=2, threshold_milli=100
    ).collect()
    assert all(r.tv_stat == 0.0 and not r.drifted for r in rep2)


def test_embedding_drift_empty_and_vanishing_lists(spark):
    """0-fill rule: a frozen list with no current mass still reports
    (its vanishing IS drift mass); an empty current generation reports
    tv 1.0 / drifted, matching the other gates' zero-total rule."""
    import math

    prev = _vec_df(
        spark,
        [(i, [math.cos(i * 1.5), math.sin(i * 1.5)]) for i in range(8)],
    )
    empty = _vec_df(spark, [])
    rep = audit.embedding_drift(prev, empty, n_lists=2, threshold_milli=100)
    rows = rep.collect()
    assert rows and all(r.tv_stat == 1.0 and bool(r.drifted) for r in rows)
    assert all(r.n_cur == 0 and r.total_cur == 0 for r in rows)


def test_embedding_drift_between_generations_matches_direct(spark):
    """Two persisted mass snapshots against the SAME frozen centroids
    diff to exactly what the end-to-end operator reports — the
    incremental seam a long-lived ingest uses (numeric twin:
    numeric_drift_between_generations)."""
    import math

    from palegislature_spark.operators.similarity import ivf_assignments

    prev = _vec_df(
        spark,
        [(i, [math.cos(i * 0.7), math.sin(i * 0.7)]) for i in range(20)],
    )
    cur = _vec_df(
        spark,
        [(i, [math.cos(i * 0.9), math.sin(i * 0.9)]) for i in range(100, 115)],
    )
    direct = audit.embedding_drift(prev, cur, n_lists=4, threshold_milli=50)
    cents, passign = ivf_assignments(prev, n_lists=4, refine_iters=0)
    pc = passign.groupBy("list_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    cc = audit.embedding_list_masses(cur, cents)
    gen = audit.embedding_drift_between_generations(pc, cc, threshold_milli=50)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(direct) == key(gen)


def test_drift_from_counts_zero_total_flags(spark):
    """A newly monitored column (previous generation total 0) must
    FLAG as drifted, not NULL out of a filter(drifted) gate."""
    counts = spark.createDataFrame(
        [("newcol", "A", 0, 7), ("newcol", "B", 0, 3)],
        "column string, category string, n_prev long, n_cur long",
    )
    rows = audit.drift_from_counts(counts, threshold=0.1).collect()
    for r in rows:
        assert r.prev_share == 0.0
        assert r.drifted is True
    assert audit.drift_from_counts(counts, 0.1).filter("drifted").count() == 2


def test_numeric_drift_between_generations_matches_split(spark):
    """The generation path (two persisted histograms, 0-filled
    full-outer join) must agree with the one-shot split-based
    numeric_drift on the same data — and a bin present only in the
    newer generation must shift the cdf and register."""
    bins = {"val": (0.0, 100.0, 10)}
    prev_rows = [(5.0,)] * 8 + [(95.0,)] * 2
    cur_rows = [(95.0,)] * 8 + [(5.0,)] * 2
    prev = spark.createDataFrame(prev_rows, "val double")
    cur = spark.createDataFrame(cur_rows, "val double")

    gen = audit.numeric_drift_between_generations(
        audit.numeric_bin_counts(prev, bins),
        audit.numeric_bin_counts(cur, bins),
        threshold_milli=300,
    ).collect()[0]
    both = prev.withColumn("cur", F.lit(False)).unionByName(
        cur.withColumn("cur", F.lit(True))
    )
    split = audit.numeric_drift(
        both, F.col("cur"), bins, threshold_milli=300
    ).collect()[0]
    assert (gen.total_prev, gen.total_cur, gen.ks_stat, gen.drifted) == (
        split.total_prev, split.total_cur, split.ks_stat, split.drifted
    )
    assert gen.ks_stat == 0.6 and bool(gen.drifted)

    # a bin only the newer generation has (value 55 -> bin 5): 0-fill
    # keeps the prev cdf flat through it, so the sup sees the new mass
    cur2 = spark.createDataFrame([(55.0,)] * 10, "val double")
    g2 = audit.numeric_drift_between_generations(
        audit.numeric_bin_counts(prev, bins),
        audit.numeric_bin_counts(cur2, bins),
        threshold_milli=300,
    ).collect()[0]
    # cdf at bin 0: prev 0.8, cur 0.0 -> sup 0.8
    assert g2.ks_stat == 0.8 and bool(g2.drifted)


def test_derive_bins_robust_range_and_degenerates(spark):
    """derive_bins: robust [p01,p99] span from one aggregate pass;
    constant and all-NULL columns get usable placeholder specs; the
    derived spec feeds numeric_drift end-to-end and still flags a
    planted shift (outliers clamp into edge bins instead of
    stretching the width)."""
    rows = [(float(i % 100), 7.0, None, 1e9 if i == 0 else float(i % 10))
            for i in range(1, 401)]
    df = spark.createDataFrame(
        rows, "val double, const double, nul double, outlier double"
    )
    bins = audit.derive_bins(df, ["val", "const", "nul", "outlier"], nbins=10)
    lo, hi, n = bins["val"]
    assert n == 10 and 0.0 <= lo <= 5.0 and 95.0 <= hi <= 99.0
    clo, chi, _ = bins["const"]
    assert clo == 7.0 and chi == 8.0            # constant widens by +1
    assert bins["nul"][:2] == (0.0, 1.0)        # all-NULL placeholder
    olo, ohi, _ = bins["outlier"]
    assert ohi <= 9.0                           # the 1e9 outlier is OUTSIDE the span

    # derived spec -> planted shift still flags through numeric_drift
    shifted = (
        df.withColumn("cur", F.lit(False))
        .unionByName(
            spark.createDataFrame(
                [(95.0, 7.0, None, 5.0)] * 400,
                "val double, const double, nul double, outlier double",
            ).withColumn("cur", F.lit(True))
        )
    )
    rep = {r.column: r for r in audit.numeric_drift(
        shifted, F.col("cur"), bins, threshold_milli=300
    ).collect()}
    assert bool(rep["val"].drifted)
    assert not rep["const"].drifted and not rep["nul"].drifted


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _py_bin(x, lo, hi, n):
    """Independent binning reference (pure python float semantics —
    python floats ARE IEEE doubles, same arithmetic Spark runs)."""
    import math

    if x is None:
        return -1
    raw = math.floor((x - lo) / ((hi - lo) / n))
    return int(min(max(raw, 0), n - 1))


@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
            st.sampled_from([0.0, -0.0, 10.0, 99.999999999, 100.0, -1e-12]),
        ),
        min_size=1,
        max_size=40,
    ),
    spec=st.sampled_from([(0.0, 100.0, 10), (-50.0, 50.0, 7), (0.0, 1.0, 3)]),
)
@settings(max_examples=10, deadline=None, derandomize=True)
def test_numeric_bin_property_vs_python(spark, vals, spec):
    """Property: the Column-expression bin assignment equals the
    python-double reference on arbitrary values including bin-edge
    and signed-zero cases — the engine-exactness seam the KS oracle
    replay rests on (one spark call per example, batched)."""
    from palegislature_spark.operators.audit import _numeric_bin_of

    lo, hi, n = spec
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i long, val double")
    got = {
        r.i: r.b
        for r in df.select("i", _numeric_bin_of("val", lo, hi, n).alias("b"))
        .collect()
    }
    want = {i: _py_bin(v, lo, hi, n) for i, v in enumerate(vals)}
    assert got == want


def test_corpus_delta_classifies_planted_changes(spark):
    """Planted add/remove/change/unchanged, one group each way."""
    from palegislature_spark.operators.audit import corpus_delta

    prev = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y"), (3, "a", "z"), (4, "b", "w")],
        "doc_id long, source string, text string",
    )
    cur = spark.createDataFrame(
        # 1 unchanged, 2 changed, 3 removed, 5 added; b untouched
        [(1, "a", "x"), (2, "a", "Y2"), (5, "a", "new"), (4, "b", "w")],
        "doc_id long, source string, text string",
    )
    got = {
        r["source"]: r.asDict()
        for r in corpus_delta(
            prev, cur, "doc_id", F.md5(F.col("text").cast("binary")),
            "source", threshold_milli=200,
        ).collect()
    }
    a = got["a"]
    assert (a["n_added"], a["n_removed"], a["n_changed"], a["n_unchanged"]) == (
        1, 1, 1, 1,
    )
    assert abs(a["churn"] - 1.0) < 1e-12  # 3 churned over 3 prev docs
    assert a["churned"]
    b = got["b"]
    assert (b["n_added"], b["n_removed"], b["n_changed"], b["n_unchanged"]) == (
        0, 0, 0, 1,
    )
    assert b["churn"] == 0.0 and not b["churned"]


def test_corpus_delta_bootstrap_empty_prev(spark):
    """An empty previous generation (bootstrap load) reports churn 1.0
    and alarms iff the current generation is non-empty."""
    from palegislature_spark.operators.audit import corpus_delta

    schema = "doc_id long, source string, text string"
    prev = spark.createDataFrame([], schema)
    cur = spark.createDataFrame([(1, "a", "x"), (2, "a", "y")], schema)
    rows = corpus_delta(
        prev, cur, "doc_id", F.md5(F.col("text").cast("binary")), "source"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_added"], r["n_removed"], r["n_changed"], r["n_unchanged"]) == (
        2, 0, 0, 0,
    )
    assert r["churn"] == 1.0 and r["churned"]


def test_corpus_delta_threshold_boundary(spark):
    """The alarm is a STRICT integer inequality: churn exactly at the
    threshold does not alarm (1 change over 10 docs at 100 permille)."""
    from palegislature_spark.operators.audit import corpus_delta

    schema = "doc_id long, source string, text string"
    docs = [(i, "a", f"t{i}") for i in range(10)]
    prev = spark.createDataFrame(docs, schema)
    cur = spark.createDataFrame(
        [(i, s, t if i else "edited") for i, s, t in docs], schema
    )
    r = corpus_delta(
        prev, cur, "doc_id", F.md5(F.col("text").cast("binary")), "source",
        threshold_milli=100,
    ).collect()[0]
    assert r["n_changed"] == 1 and r["n_unchanged"] == 9
    assert not r["churned"]  # 1*1000 > 100*10 is false (equality)
    r2 = corpus_delta(
        prev, cur, "doc_id", F.md5(F.col("text").cast("binary")), "source",
        threshold_milli=99,
    ).collect()[0]
    assert r2["churned"]


# --------------------------------------------------------------------------
# profile_columns (one-pass table profiler)
# --------------------------------------------------------------------------


def test_profile_columns_planted_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, None, 30), (4, "a", None)],
        "id long, cat string, v long",
    )
    got = {
        r.col_name: r
        for r in audit.profile_columns(df, ["id", "cat", "v"]).collect()
    }
    assert set(got) == {"id", "cat", "v"}
    assert all(r.n_rows == 4 for r in got.values())
    assert (got["id"].n_nulls, got["id"].n_distinct) == (0, 4)
    assert (got["cat"].n_nulls, got["cat"].n_distinct) == (1, 2)
    assert (got["v"].n_nulls, got["v"].n_distinct) == (1, 2)
    # values profile as strings: bytewise min/max, ints render exactly
    assert (got["cat"].min_val, got["cat"].max_val) == ("a", "b")
    assert (got["v"].min_val, got["v"].max_val) == ("10", "30")


def test_profile_columns_all_null_column(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "id long, dead string"
    )
    got = {
        r.col_name: r for r in audit.profile_columns(df, ["dead"]).collect()
    }
    r = got["dead"]
    assert (r.n_nulls, r.n_distinct, r.min_val, r.max_val) == (2, 0, None, None)


# --------------------------------------------------------------------------
# delta_severity (changed-doc minor-edit vs rewrite)
# --------------------------------------------------------------------------


def _gen(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_delta_severity_classes(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    prev = _gen(spark, [(1, base), (2, base), (3, base), (4, base)])
    cur = _gen(
        spark,
        [
            (1, base),                                  # unchanged -> absent
            (2, base + " tail"),                        # one new gram -> minor
            (3, "totally different words here now ok"), # no overlap -> rewrite
            # 4 missing -> removed, absent from the report
        ],
    )
    got = {
        r.doc_id: r
        for r in audit.delta_severity(prev, cur, "doc_id", "text").collect()
    }
    assert set(got) == {2, 3}
    assert got[2].severity == "minor" and got[2].jaccard > 0.8
    assert got[3].severity == "rewrite" and got[3].n_common == 0
    # jaccard is the exact long/long division
    r = got[2]
    assert r.jaccard == r.n_common / (r.n_prev + r.n_cur - r.n_common)


def test_delta_severity_short_docs_excluded(spark):
    prev = _gen(spark, [(1, "one two")])   # < 3 tokens: no gram set
    cur = _gen(spark, [(1, "two one")])
    assert audit.delta_severity(prev, cur, "doc_id", "text").count() == 0


def test_delta_severity_boundary_is_integer_exact(spark):
    """A doc sitting exactly ON the minor_milli cut classifies 'minor'
    (>=), decided by integer arithmetic, not a double compare."""
    # prev: grams {a b c, b c d} (4 tokens); cur shares 1 of 2 grams ->
    # union 3, common 1 -> jaccard exactly 1/3 -> minor at 333? No:
    # pick minor_milli so common*1000 == milli*union: 1*1000 == 333*3
    # is false (999); use milli=250 with union 4, common 1.
    prev = _gen(spark, [(1, "a b c d")])          # grams: abc, bcd
    cur = _gen(spark, [(1, "a b c x y")])         # grams: abc, bcx, cxy
    out = audit.delta_severity(
        prev, cur, "doc_id", "text", minor_milli=250
    ).collect()[0]
    # common=1, union=4 -> 1*1000 == 250*4 exactly -> minor
    assert (out.n_common, out.n_prev + out.n_cur - out.n_common) == (1, 4)
    assert out.severity == "minor"


def test_profile_columns_approx_tier(spark):
    """The approx tier reports within HLL++ tolerance of exact on a
    known-cardinality column, everything else bit-identical, and the
    plan carries no Expand (the sketch combines map-side)."""
    import pytest

    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 50).alias("cat")
    )
    exact = {
        r.col_name: r for r in audit.profile_columns(df, ["id", "cat"]).collect()
    }
    approx = {
        r.col_name: r
        for r in audit.profile_columns(
            df, ["id", "cat"], distinct="approx"
        ).collect()
    }
    for c in ("id", "cat"):
        e, a = exact[c], approx[c]
        assert (a.n_rows, a.n_nulls, a.min_val, a.max_val) == (
            e.n_rows, e.n_nulls, e.min_val, e.max_val,
        )
        # HLL++ default rsd 5%; allow 3 sigma
        assert abs(a.n_distinct - e.n_distinct) <= max(2, 0.15 * e.n_distinct)
    plan = audit.profile_columns(
        df, ["id", "cat"], distinct="approx"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan

    with pytest.raises(ValueError):
        audit.profile_columns(df, ["id"], distinct="bogus")


def test_profile_columns_numeric_bounds_vs_bytewise(spark):
    """ADVICE r10: values {9, 100} — bytewise min/max report
    min_val='100', max_val='9' (byte order), while the typed
    num_min/num_max carry the NUMERIC bounds 9.0/100.0; string
    columns carry NULL numeric bounds."""
    df = spark.createDataFrame(
        [(9, "x"), (100, "y")], "v long, s string"
    )
    got = {
        r.col_name: r for r in audit.profile_columns(df, ["v", "s"]).collect()
    }
    assert (got["v"].min_val, got["v"].max_val) == ("100", "9")  # bytewise!
    assert (got["v"].num_min, got["v"].num_max) == (9.0, 100.0)  # numeric
    assert (got["s"].num_min, got["s"].num_max) == (None, None)


def test_profile_columns_wide_tier(spark):
    """layout='wide' (VERDICT r10 wrong-#2): same report as the melt
    at approx distinct, NO explode of the corpus scan (the only
    Generate runs on the 1-row aggregate), and wide+exact is rejected
    (it would re-introduce the Expand)."""
    import pytest

    df = spark.range(0, 500).select(
        F.col("id"),
        (F.col("id") % 7).alias("cat"),
        F.when(F.col("id") % 5 == 0, None).otherwise(
            F.concat(F.lit("s"), F.col("id"))
        ).alias("s"),
    )
    cols = ["id", "cat", "s"]
    melt = {
        r.col_name: r
        for r in audit.profile_columns(df, cols, distinct="approx").collect()
    }
    wide = {
        r.col_name: r
        for r in audit.profile_columns(
            df, cols, distinct="approx", layout="wide"
        ).collect()
    }
    assert set(wide) == set(melt)
    for c in cols:
        m, w = melt[c], wide[c]
        assert (w.n_rows, w.n_nulls, w.min_val, w.max_val,
                w.num_min, w.num_max) == (
            m.n_rows, m.n_nulls, m.min_val, m.max_val, m.num_min, m.num_max,
        )
        # both are the same HLL++ sketch over the same values
        assert w.n_distinct == m.n_distinct
    with pytest.raises(ValueError):
        audit.profile_columns(df, cols, distinct="exact", layout="wide")
    with pytest.raises(ValueError):
        audit.profile_columns(df, cols, layout="sideways")
