"""Error-bound contracts for the sketch operators (no SQL oracle exists:
engines implement different approximation algorithms — the bound IS the
spec a production user relies on)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.sketches import (
    approx_user_counts,
    approx_value_quantiles,
)
from data_ingestion_backend_spark.sources.fixtures import load_table
from tests.conftest import SF_DIR_ORACLE


def test_hll_within_error_bound(spark):
    exact = {
        r["event_type"]: r["u"]
        for r in load_table(spark, SF_DIR_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    for r in approx_user_counts(spark, SF_DIR_ORACLE).collect():
        e = exact[r["event_type"]]
        # 2% rsd → allow 4 sigma ≈ 8%
        assert abs(r["approx_users"] - e) <= max(0.08 * e, 2), (r, e)


def test_quantiles_within_rank_error(spark):
    ev = load_table(spark, SF_DIR_ORACLE, "events").cache()
    approx = {
        r["event_type"]: r["quantiles"]
        for r in approx_value_quantiles(spark, SF_DIR_ORACLE).collect()
    }
    for etype, (p50, p95, p99) in approx.items():
        vals = sorted(
            x["value"]
            for x in ev.filter(F.col("event_type") == etype).select("value").collect()
        )
        n = len(vals)

        def rank_of(v):
            return sum(1 for x in vals if x <= v) / n

        # GK guarantee: rank error ≤ 1/accuracy (=0.1%); allow slack ×5
        assert abs(rank_of(p50) - 0.5) <= 0.005
        assert abs(rank_of(p95) - 0.95) <= 0.005
        assert abs(rank_of(p99) - 0.99) <= 0.005
