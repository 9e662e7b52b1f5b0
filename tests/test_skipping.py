"""Range-clustered layout + file-skipping tests: the pruned read must
open strictly fewer files than the directory holds while returning
exactly the full-scan filter's rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from palegislature_spark.catalog import load
from palegislature_spark.sources.skipping import (
    file_stats,
    pruned_read,
    write_range_clustered,
)
from tests.conftest import rows


def test_pruned_read_opens_fewer_files_same_rows(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_ranged")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_range_clustered(orders, path, "o_orderkey", n_files=8)
    stats = file_stats(spark, path, "o_orderkey")
    assert len(stats) == 8
    # disjoint ranges: sorted los strictly increase past previous his
    ordered = sorted(stats, key=lambda s: s["lo"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["hi"] <= b["lo"]

    lo = ordered[1]["lo"]
    hi = ordered[1]["hi"]  # one interior file's exact range
    got = pruned_read(spark, path, stats, "o_orderkey", lo, hi)
    opened = set(got.inputFiles())
    assert len(opened) <= 2  # the matching file (+1 boundary overlap)
    want = (
        spark.read.parquet(path)
        .filter((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") <= hi))
    )
    assert rows(got, "o_orderkey", "o_custkey") == rows(
        want, "o_orderkey", "o_custkey"
    )
    assert len(set(want.inputFiles())) == 8  # full scan lists all


def test_pruned_read_empty_range(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_ranged2")
    orders = load(spark, sf_dir, "orders").select("o_orderkey")
    write_range_clustered(orders, path, "o_orderkey", n_files=4)
    stats = file_stats(spark, path, "o_orderkey")
    top = max(s["hi"] for s in stats)
    out = pruned_read(spark, path, stats, "o_orderkey", top + 10, top + 20)
    assert out.count() == 0


def test_stats_correct_on_unclustered_layout(spark, sf_dir, tmp_path):
    """Skipping stays CORRECT (if unselective) when the layout is not
    range-clustered: every overlapping file is read, results equal
    the full filter."""
    path = str(tmp_path / "orders_hash")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    orders.repartition(4, "o_custkey").write.mode("overwrite").parquet(path)
    stats = file_stats(spark, path, "o_orderkey")
    lo, hi = 100, 500
    got = pruned_read(spark, path, stats, "o_orderkey", lo, hi)
    want = spark.read.parquet(path).filter(
        (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") <= hi)
    )
    assert rows(got, "o_orderkey", "o_custkey") == rows(
        want, "o_orderkey", "o_custkey"
    )
