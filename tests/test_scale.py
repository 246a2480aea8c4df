"""Skew/co-location machinery: salted aggregation equality, bucketed joins."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.scale import (
    bucketed_join,
    salted_aggregate,
    write_bucketed,
)
from data_ingestion_backend_spark.plans.audit import formatted_plan
from data_ingestion_backend_spark.sources.fixtures import load_table
from tests.conftest import SF_DIR_ORACLE


def test_salted_aggregate_matches_direct(spark):
    """Salted two-phase agg must equal the direct groupBy bit-for-bit on
    exact types (longs/decimals), including on a skewed key."""
    ev = load_table(spark, SF_DIR_ORACLE, "events")
    # manufacture skew: fold 90% of users onto one hot key
    skewed = ev.withColumn(
        "user_id", F.when(F.col("user_id") % 10 != 0, 7).otherwise(F.col("user_id"))
    )
    aggs = {
        "n": F.count("*"),
        "total": F.sum(F.col("value").cast("decimal(18,2)")),
        "first_ev": F.min("event_id"),
        "last_ev": F.max("event_id"),
    }
    direct = {
        r["user_id"]: (r["n"], r["total"], r["first_ev"], r["last_ev"])
        for r in skewed.groupBy("user_id").agg(
            *[e.alias(n) for n, e in aggs.items()]
        ).collect()
    }
    salted_spec = dict(aggs, total=(aggs["total"], "sum"))  # sum needs explicit combine
    salted = {
        r["user_id"]: (r["n"], r["total"], r["first_ev"], r["last_ev"])
        for r in salted_aggregate(
            skewed, ["user_id"], salted_spec, n_salts=16, salt_source="event_id"
        ).collect()
    }
    assert salted == direct


def test_salted_aggregate_explicit_combine_and_rejects(spark):
    """Non-decomposable / ambiguous aggregates must raise, not silently
    recombine with SUM; explicit (expr, combine) tuples are the API."""
    ev = load_table(spark, SF_DIR_ORACLE, "events").limit(100)
    # explicit tuples work end-to-end
    out = salted_aggregate(
        ev,
        ["event_type"],
        {"n": (F.count("*"), "sum"), "hi": (F.max("event_id"), "max")},
        salt_source="event_id",
    ).collect()
    assert out
    # avg is not decomposable into sum/min/max subtotals
    with pytest.raises(ValueError, match="cannot infer"):
        salted_aggregate(ev, ["event_type"], {"a": F.avg("value")})
    # count(col) is string-ambiguous with count_distinct(col) — refuse both
    with pytest.raises(ValueError, match="cannot infer"):
        salted_aggregate(ev, ["event_type"], {"c": F.count("value")})
    with pytest.raises(ValueError, match="cannot infer"):
        salted_aggregate(ev, ["event_type"], {"d": F.count_distinct("value")})
    # sum_distinct stringifies as "sum(DISTINCT v)" — its head would pass a
    # naive allowlist, but distinct subtotals are NOT sum-combinable
    with pytest.raises(ValueError, match="cannot infer"):
        salted_aggregate(ev, ["event_type"], {"sd": F.sum_distinct("value")})
    # bad explicit combine name
    with pytest.raises(ValueError, match="unknown combine"):
        salted_aggregate(ev, ["event_type"], {"n": (F.count("*"), "avg")})


@pytest.mark.usefixtures("spark")
def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Same-bucketed tables must join with zero shuffles (the write-time
    shuffle is amortized over every later join on the key)."""
    orders = load_table(spark, SF_DIR_ORACLE, "orders")
    lineitem = load_table(spark, SF_DIR_ORACLE, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8, path=str(tmp_path / "bo"))
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", 8, path=str(tmp_path / "bl"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it actually runs
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucket_point_lookup_reads_one_bucket(spark, tmp_path):
    """Equality on the bucketing key must prune to ONE bucket at
    planning time (SelectedBucketsCount) and return exactly the row."""
    from data_ingestion_backend_spark.operators.scale import bucket_point_lookup
    from data_ingestion_backend_spark.plans.audit import formatted_plan
    from data_ingestion_backend_spark.sources.fixtures import load_table
    from tests.conftest import SF_DIR_ORACLE

    orders = load_table(spark, SF_DIR_ORACLE, "orders")
    write_bucketed(orders, "pl_orders", "o_orderkey", 16, path=str(tmp_path / "bo"))

    key = orders.select("o_orderkey").limit(1).collect()[0][0]
    rows = bucket_point_lookup(spark, "pl_orders", "o_orderkey", key)
    assert len(rows) == 1 and rows[0]["o_orderkey"] == key

    # plan pin under the same conf the helper uses
    conf_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "false")
    try:
        plan = formatted_plan(
            spark.table("pl_orders").filter(F.col("o_orderkey") == key)
        )
    finally:
        spark.conf.set(conf_key, prev)
    assert "SelectedBucketsCount: 1 out of 16" in plan
