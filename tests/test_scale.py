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


def test_salted_join_equals_plain_join(spark):
    """Property equality on a planted 20%-hot key: the salted form must
    reproduce the plain join's row MULTISET exactly (inner and left),
    and non-hot keys must not be replicated."""
    from data_ingestion_backend_spark.operators.scale import salted_join

    ev = load_table(spark, SF_DIR_ORACLE, "events").select(
        "event_id", "user_id", "event_type"
    )
    # plant the skew: 20% of events funneled onto one hot user
    hot_user = 0
    ev = ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(hot_user)).otherwise(
            F.col("user_id")
        ),
    )
    dim = (
        load_table(spark, SF_DIR_ORACLE, "events")
        .select(F.col("user_id")).distinct()
        .withColumn("segment", F.col("user_id") % 7)
    )

    def multiset(df):
        rows = [tuple(str(v) for v in r) for r in df.collect()]
        out = {}
        for t in rows:
            out[t] = out.get(t, 0) + 1
        return out

    for how in ("inner", "left"):
        plain = ev.join(dim, "user_id", how).select(
            "user_id", "event_id", "event_type", "segment"
        )
        salted = salted_join(
            ev, dim, "user_id", [hot_user], fact_salt_source="event_id", how=how
        ).select("user_id", "event_id", "event_type", "segment")
        assert multiset(plain) == multiset(salted), f"{how} join diverged"

    # guard rails
    with pytest.raises(ValueError):
        salted_join(ev, dim, "user_id", [hot_user], how="full")
    with pytest.raises(ValueError):
        salted_join(ev, dim, "user_id", [hot_user])  # no salt source
    # empty hot list degrades to the plain join (same plan, no _salt)
    assert "_salt" not in salted_join(ev, dim, "user_id", []).columns


def test_salted_join_spreads_hot_key_partitions(spark):
    """The mechanism itself: after salting, the hot key's fact rows hash
    to n_salts distinct (key, salt) shuffle keys instead of one."""
    from data_ingestion_backend_spark.operators.scale import salted_join

    ev = load_table(spark, SF_DIR_ORACLE, "events").select("event_id", "user_id")
    ev = ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(0)).otherwise(F.col("user_id")),
    )
    n_salts = 8
    salts_used = (
        ev.filter(F.col("user_id") == 0)
        .withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("event_id")), F.lit(n_salts)).cast("int")
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts_used == n_salts, "hot rows did not spread over all salts"
