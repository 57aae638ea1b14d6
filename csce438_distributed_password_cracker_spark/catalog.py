"""Loaders for the driver-generated test tables (TESTDATA.md).

One parquet file per table under ``/root/testdata/sf*/``.  All engine
queries take an explicit ``sf_dir`` so the same plan runs at any scale
factor — and, at 100 TB, against a partitioned table directory instead of a
single file (``spark.read.parquet`` handles both transparently).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # Some driver generations store ts as TIMESTAMP(NANOS), which Spark's
        # parquet reader rejects unless nanosAsLong is set; in that mode the
        # column arrives as int64 nanos and is floored to a microsecond
        # timestamp (matches DuckDB's ns→us cast).  Other generations store
        # TIMESTAMP(MICROS), which reads as a timestamp directly — detect by
        # the materialized dtype rather than assuming one layout.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            # The MICROS parquet layout reads as TIMESTAMP_NTZ; normalize to
            # TIMESTAMP (identity under the session's pinned UTC tz) so every
            # consumer sees one dtype regardless of the driver's layout.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for the SQL API path)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
