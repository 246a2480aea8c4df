"""ORC round-trip/pushdown parity + schema-evolution conformance."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from conftest import SF_DIR_ORACLE
from data_ingestion_backend_spark.plans.audit import formatted_plan
from data_ingestion_backend_spark.sources.evolution import conform, read_evolving
from data_ingestion_backend_spark.sources.fixtures import load_table
from data_ingestion_backend_spark.sources.orc import read_orc, write_orc


def _row_hashes(df):
    cols = sorted(df.columns)
    h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
    return {r[0] for r in df.select(h).collect()}


def test_orc_roundtrip_bit_faithful(spark, tmp_path):
    src = load_table(spark, SF_DIR_ORACLE, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert _row_hashes(back) == _row_hashes(src)


def test_orc_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    path = str(tmp_path / "orders_orc")
    write_orc(load_table(spark, SF_DIR_ORACLE, "orders"), path)
    df = (
        read_orc(spark, path)
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
    )
    plan = formatted_plan(df)
    # format switch must not lose scan avoidance: predicate reaches the
    # ORC stripe indexes, projection prunes to the 3 referenced columns
    assert "PushedFilters" in plan and "o_orderstatus" in plan.split("PushedFilters", 1)[1][:200]
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert len(read_schema.split(",")) <= 3


def test_orc_hive_partitioned_prunes_at_planning(spark, tmp_path):
    path = str(tmp_path / "orders_part")
    write_orc(
        load_table(spark, SF_DIR_ORACLE, "orders"),
        path,
        partition_by=["o_orderstatus"],
    )
    df = read_orc(spark, path).filter(F.col("o_orderstatus") == "F")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    got = df.count()
    want = (
        load_table(spark, SF_DIR_ORACLE, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .count()
    )
    assert got == want


TARGET = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("tag", T.StringType()),
    ]
)


def test_conform_adds_drops_and_casts(spark):
    df = spark.createDataFrame([(1, 2, "x", True)], "id int, v int, extra string, junk boolean")
    out = conform(df, TARGET)
    assert out.schema == TARGET
    row = out.collect()[0]
    assert (row["id"], row["v"], row["tag"]) == (1, 2.0, None)


def test_read_evolving_merges_generations(spark, tmp_path):
    # gen1: (id, v) — no tag column yet; gen2 adds tag
    g1 = str(tmp_path / "g1")
    g2 = str(tmp_path / "g2")
    spark.createDataFrame([(1, 1.5)], "id bigint, v double").write.parquet(g1)
    spark.createDataFrame(
        [(2, 2.5, "new")], "id bigint, v double, tag string"
    ).write.parquet(g2)
    out = read_evolving(spark, [g1, g2], TARGET)
    assert out.schema == TARGET
    rows = {tuple(r) for r in out.collect()}
    assert rows == {(1, 1.5, None), (2, 2.5, "new")}


def test_read_evolving_handles_type_widening(spark, tmp_path):
    # gen1 wrote id as INT, gen2 as BIGINT — parquet mergeSchema refuses
    # the cross-file type change; the fallback conforms per generation
    g1 = str(tmp_path / "g1")
    g2 = str(tmp_path / "g2")
    spark.createDataFrame([(1, 1.0)], "id int, v double").write.parquet(g1)
    spark.createDataFrame([(2**40, 2.0)], "id bigint, v double").write.parquet(g2)
    out = read_evolving(spark, [g1, g2], TARGET)
    assert out.schema == TARGET
    ids = {r["id"] for r in out.collect()}
    assert ids == {1, 2**40}
