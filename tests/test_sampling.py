"""Deterministic split/sampling tests: stability, proportions, strata."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from palegislature_spark.operators.sampling import (
    hash_split,
    stratified_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(2000)]
    return spark.createDataFrame(rows, "id long, lang string")


def test_hash_split_partitions_and_proportions(corpus):
    out = hash_split(corpus, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == 2000
    assert 1500 < counts["train"] < 1700  # ~1600 ± hash noise
    assert 300 < counts["val"] + counts["test"] < 500  # ~400 (= 2 x 10%)


def test_hash_split_stable_under_repartition(corpus):
    a = {r["id"]: r["split"] for r in hash_split(corpus, "id", {"train": 0.5, "test": 0.5}).collect()}
    b = {
        r["id"]: r["split"]
        for r in hash_split(
            corpus.repartition(17, "lang"), "id", {"train": 0.5, "test": 0.5}
        ).collect()
    }
    assert a == b


def test_hash_split_salt_changes_assignment(corpus):
    a = {r["id"]: r["split"] for r in hash_split(corpus, "id", {"x": 0.5, "y": 0.5}, salt="s1").collect()}
    b = {r["id"]: r["split"] for r in hash_split(corpus, "id", {"x": 0.5, "y": 0.5}, salt="s2").collect()}
    assert a != b  # different salt, different (but each internally stable) draw


def test_hash_split_rejects_bad_weights(corpus):
    with pytest.raises(ValueError, match="sum"):
        hash_split(corpus, "id", {"a": 0.5, "b": 0.2}).collect()


def test_stratified_sample_rates_and_determinism(corpus):
    out = stratified_sample(corpus, "id", "lang", {"en": 0.25, "de": 1.0})
    got = out.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in got}
    # de (667 rows) kept fully; en (~1333) downsampled to ~333
    assert counts["de"] == 667
    assert 260 < counts["en"] < 410
    again = stratified_sample(corpus, "id", "lang", {"en": 0.25, "de": 1.0})
    assert sorted(r["id"] for r in again.collect()) == sorted(
        r["id"] for r in out.collect()
    )


def test_stratified_sample_default_fraction(corpus):
    # unknown strata dropped by default, kept at default_fraction if set
    none = stratified_sample(corpus, "id", "lang", {"de": 1.0})
    assert none.filter("lang = 'en'").count() == 0
    some = stratified_sample(
        corpus, "id", "lang", {"de": 1.0}, default_fraction=0.1
    )
    en = some.filter("lang = 'en'").count()
    assert 80 < en < 190


def test_sample_k_per_group_exact_and_stable(corpus):
    from palegislature_spark.operators.sampling import sample_k_per_group

    out = sample_k_per_group(corpus, "id", "lang", 7)
    counts = {
        r["lang"]: r["count"]
        for r in out.groupBy("lang").count().collect()
    }
    assert counts == {"en": 7, "de": 7}
    again = sample_k_per_group(corpus.repartition(13), "id", "lang", 7)
    assert sorted(r["id"] for r in again.collect()) == sorted(
        r["id"] for r in out.collect()
    )
    # k larger than the group: whole group comes back
    small = corpus.filter("id < 3")
    assert sample_k_per_group(small, "id", "lang", 100).count() == 3


def test_epoch_order_is_total_permutation(spark):
    """Positions are exactly 1..n, the order equals the global sort by
    (md5 key, id), different seeds give different orders, and no
    single-partition window exists in the plan (the 256-bucket windows
    partition by bucket; the only global window runs on the 256-row
    offset table)."""
    import hashlib

    from palegislature_spark.operators.sampling import epoch_order

    df = spark.createDataFrame([(i,) for i in range(97)], "doc_id long")
    out = epoch_order(df, "doc_id", "epoch1:").collect()
    assert sorted(r.position for r in out) == list(range(1, 98))
    expected = sorted(
        range(97),
        key=lambda i: (hashlib.md5(f"epoch1:{i}".encode()).hexdigest(), i),
    )
    got = [r.doc_id for r in sorted(out, key=lambda r: r.position)]
    assert got == expected

    out2 = epoch_order(df, "doc_id", "epoch2:").collect()
    got2 = [r.doc_id for r in sorted(out2, key=lambda r: r.position)]
    assert got2 != got  # a different epoch reshuffles
    assert sorted(got2) == sorted(got)  # ... but is still a permutation


def test_group_split_never_straddles(spark):
    """Every id of a group gets the group's split (no straddling), and
    the assignment matches hashing the group key directly."""
    from palegislature_spark.operators.sampling import hash_split

    rows = [(i, f"g{i % 7}") for i in range(70)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = hash_split(df, "grp", {"train": 0.8, "val": 0.1, "test": 0.1},
                     salt="gsplit").collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, set()).add(r.split)
    assert all(len(s) == 1 for s in by_grp.values())
    grp_only = hash_split(
        df.select("grp").distinct(), "grp",
        {"train": 0.8, "val": 0.1, "test": 0.1}, salt="gsplit",
    ).collect()
    want = {r.grp: r.split for r in grp_only}
    assert all(by_grp[g] == {want[g]} for g in want)


def test_epoch_order_property_arbitrary_ids(spark):
    """Property (hypothesis): for ANY set of unique long ids —
    negative, huge, sparse — epoch_order emits positions 1..n in
    exactly the (md5 key, id) global order."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from palegislature_spark.operators.sampling import epoch_order

    @given(
        ids=st.lists(
            st.integers(min_value=-(2**62), max_value=2**62),
            min_size=1, max_size=40, unique=True,
        )
    )
    @settings(max_examples=10, deadline=None, derandomize=True)
    def check(ids):
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        out = epoch_order(df, "doc_id", "e:").collect()
        assert sorted(r.position for r in out) == list(range(1, len(ids) + 1))
        got = [r.doc_id for r in sorted(out, key=lambda r: r.position)]
        want = sorted(ids, key=lambda i: (hashlib.md5(f"e:{i}".encode()).hexdigest(), i))
        assert got == want

    check()
