"""Table loading for the driver testdata and engine-produced datasets.

Reads are plain ``spark.read.parquet`` so Catalyst keeps predicate
pushdown / column pruning / partition pruning (SURVEY §4.2). At cluster
scale the same loaders point at partitioned directories; nothing here
assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame.

    events.parquet carries TIMESTAMP(NANOS) which Spark's reader
    rejects; read nanos as long and floor-convert to microseconds
    (integer DIV — double division would lose precision above 2^53),
    matching DuckDB's truncating nanos->micros read.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in STAR_TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
