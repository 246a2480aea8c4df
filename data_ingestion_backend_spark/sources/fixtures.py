"""Parquet fixture loaders (the engine's table-scan surface, SURVEY §2.1 S4).

The reference scans Postgres tables through an ORM
(``src/app/repository/*_repository.py``); here every table is a columnar
parquet scan that Catalyst can push filters and projections into.  At
cluster scale the same loaders point at object-store URIs; nothing else
changes.

The one genuinely tricky source is ``events``: the fixture stores ``ts`` as
parquet TIMESTAMP(NANOS), which Spark 4.x cannot read natively.  With
``spark.sql.legacy.parquet.nanosAsLong=true`` (set by the session factory)
the column arrives as a nanosecond LONG; :func:`load_table` converts it to a
microsecond timestamp so downstream operators see a normal TimestampType.
Nanos→micros truncation is safe for this engine: event-time operators
(windows, watermarks, dedup ordering) operate at ≥ms granularity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES: tuple[str, ...] = (
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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing physical quirks into clean types."""
    if name == "events":
        # runtime-settable; without it Spark refuses TIMESTAMP(NANOS)
        # parquet outright, so callers on vanilla sessions would fail
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # nanosAsLong shim: LONG nanoseconds → TimestampType (µs precision).
        # `div` is exact integer division — `cast(ts/1000 as long)` would
        # round-trip through DOUBLE (53-bit mantissa < 60-bit ns epoch
        # values) and land ±1µs off the truncated value.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load the fixture star schema as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load fixture tables and register each as a temp view for spark.sql."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
