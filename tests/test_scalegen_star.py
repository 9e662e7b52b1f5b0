"""Replica-generator invariants: the 10x dataset must grow rows
without changing the per-key workload statistics bench relies on."""

from __future__ import annotations

import sys
import pathlib

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replica(spark, tmp_path_factory):
    from scalegen_star import replicate

    out = str(tmp_path_factory.mktemp("replica"))
    replicate(spark, SRC, out, 3)
    return out


def test_row_counts_scale_and_dims_fixed(spark, replica):
    from palegislature_spark.catalog import load

    for t in ("customer", "orders", "lineitem", "events", "documents", "embeddings"):
        assert load(spark, replica, t).count() == 3 * load(spark, SRC, t).count(), t
    for t in ("region", "nation"):
        assert load(spark, replica, t).count() == load(spark, SRC, t).count(), t


def test_keys_disjoint_and_densities_preserved(spark, replica):
    from palegislature_spark.catalog import load

    # key domains stay collision-free across copies
    o = load(spark, replica, "orders")
    assert o.select("o_orderkey").distinct().count() == o.count()
    # per-customer order density unchanged: every original profile
    # appears exactly 3x under shifted keys
    src_prof = sorted(
        r["n"]
        for r in load(spark, SRC, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    rep_prof = sorted(
        r["n"]
        for r in o.groupBy("o_custkey").agg(F.count("*").alias("n")).collect()
    )
    assert rep_prof == sorted(src_prof * 3)


def test_documents_get_per_copy_vocabulary(spark, replica):
    """Cross-copy text must differ (no quadratic clone-pair workload)
    while stopwords survive so gate ratios stay put."""
    from palegislature_spark.catalog import load

    src_docs = load(spark, SRC, "documents")
    rep_docs = load(spark, replica, "documents")
    n_src = src_docs.count()
    # exact-dup groups across the whole replica: each text may appear
    # only once (copy 0 keeps originals; copies 1+ are salted)
    assert (
        rep_docs.groupBy("text").count().filter("count > 1").count() == 0
    )
    # stopword totals scale exactly 3x
    def stops(df):
        tk = F.split("text", " ")
        return df.select(
            F.sum(
                F.size(F.filter(tk, lambda w: w.isin("the", "a", "of", "and")))
            ).alias("s")
        ).collect()[0]["s"]

    assert stops(rep_docs) == 3 * stops(src_docs)
