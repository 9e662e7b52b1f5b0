"""Registry integrity + driver-contract smoke tests."""

from __future__ import annotations

import re

import __spark_entry__ as entrypoint
from palegislature_spark.queries import REGISTRY


def test_registry_specs_complete():
    assert len(REGISTRY) >= 43
    for name, spec in REGISTRY.items():
        assert spec.name == name
        assert spec.covers, f"{name} missing SURVEY coverage citation"
        assert callable(spec.fn)


def test_driver_contract_shapes():
    qs = entrypoint.queries()
    oracles = entrypoint.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle is a plain SELECT usable by DuckDB
    for name, sql in oracles.items():
        assert re.match(r"\s*(WITH|SELECT)\b", sql, re.IGNORECASE), name
    # non-SQL-expressible (approximate) ops are the only rows-only entries
    rows_only = set(qs) - set(oracles)
    assert rows_only <= {"knn_lsh", "knn_ivf"}


def test_flagship_runs(spark, sf_dir):
    df = entrypoint.queries()[entrypoint.FLAGSHIP](spark, sf_dir)
    out = df.collect()
    assert len(out) > 0
    assert df.columns[0] == "l_returnflag"


def test_output_columns_are_scalar(spark, sf_dir):
    """Registration-time lint: no registry query may return a top-level
    array/map/struct column.  Downstream canonicalizers (the driver's
    pandas sort/hash compare, CSV sinks) cannot sort or hash Python
    lists, so complex values must be stringified inside the query
    (``array_join(array_sort(...))`` etc.) before they are returned —
    the convention every query already follows; this test keeps the
    failure class dead (bpe_encode_corpus regressed on it in r6)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, spec in sorted(REGISTRY.items()):
        df = spec.fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, f"non-scalar top-level output columns: {offenders}"
