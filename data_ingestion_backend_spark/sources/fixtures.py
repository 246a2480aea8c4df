"""Parquet fixture loaders (the engine's table-scan surface, SURVEY §2.1 S4).

The reference scans Postgres tables through an ORM
(``src/app/repository/*_repository.py``); here every table is a columnar
parquet scan that Catalyst can push filters and projections into.  At
cluster scale the same loaders point at object-store URIs; nothing else
changes.

The one genuinely tricky source is ``events``: fixture generations have
shipped ``ts`` under different physical parquet types — TIMESTAMP(NANOS)
(which Spark 4.x reads as a nanosecond LONG under
``spark.sql.legacy.parquet.nanosAsLong=true``) and tz-naive
``timestamp[us]`` (which Spark reads as TIMESTAMP_NTZ).  A real ingestion
engine must normalize whatever physical timestamp arrives, so
:func:`load_table` converts every variant to one canonical TimestampType;
downstream operators never see LONG/NTZ timestamps.  Under the pinned UTC
session timezone the NTZ→TIMESTAMP cast is exact (no wall-clock shift), and
nanos→micros truncation is safe: event-time operators (windows, watermarks,
dedup ordering) operate at ≥ms granularity.
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
    if name == "events":
        df = normalize_event_time(df)
    return df


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize any physical event-time representation to TimestampType.

    Fixture/source generations vary: LONG nanoseconds (nanosAsLong shim),
    TIMESTAMP_NTZ (tz-naive ``timestamp[us]`` parquet), or already-clean
    TimestampType.  Batch and streaming scans both funnel through here so
    the "downstream sees TimestampType" contract lives in exactly one place.
    """
    if col not in df.columns:
        # Event-time contract: sources without the column pass through
        # unchanged (callers that REQUIRE event time fail on their own
        # terms, with the column name, not an opaque schema KeyError here).
        return df
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        # nanosAsLong shim: LONG nanoseconds → TimestampType (µs precision).
        # `div` is exact integer division — `cast(ts/1000 as long)` would
        # round-trip through DOUBLE (53-bit mantissa < 60-bit ns epoch
        # values) and land ±1µs off the truncated value.
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif isinstance(dt, T.TimestampNTZType):
        # NTZ → TIMESTAMP is exact under the pinned UTC session timezone:
        # the wall-clock fields are reinterpreted as UTC instants 1:1.
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load the fixture star schema as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load fixture tables and register each as a temp view for spark.sql.

    Invalidates the SQL surface's registration memo (plans/catalog.py):
    this function may rebind the same view names to a different sf_dir,
    and a later ``run_sql`` must re-register rather than trust its memo
    over views someone else overwrote.
    """
    from data_ingestion_backend_spark.plans import catalog

    # The memo is keyed by the live session object (WeakKeyDictionary) —
    # popping by session both matches the key type (a string appId would
    # raise: str is not weak-referenceable) and invalidates exactly the
    # session whose views this call is about to rebind.
    try:
        catalog._REGISTERED.pop(spark, None)
    except TypeError:  # mock/stub sessions that refuse weak references
        pass
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
