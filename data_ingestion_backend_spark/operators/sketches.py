"""Sketch operators: approximate distinct counts and quantiles.

At 100 TB, exact COUNT(DISTINCT) and exact percentiles are shuffle-heavy
(full repartition of the distinct keys / a global sort); the sketch forms
are single-pass, mergeable, and bounded-memory:

- ``approx_count_distinct`` — HyperLogLog++ (relative error configurable
  via ``rsd``; default 5%, here pinned tighter).
- ``percentile_approx`` — Greenwald-Khanna quantile summaries with an
  accuracy knob (rank error ≤ 1/accuracy).

No DuckDB oracle: both engines implement different approximation
algorithms, so values legitimately differ.  Certification is instead an
error-bound contract against the exact answers
(tests/test_sketches.py) — which is exactly the guarantee a user of the
sketch gets in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.queries import STANDALONE_QUERIES
from data_ingestion_backend_spark.sources.fixtures import load_table

HLL_RSD = 0.02          # ≤2% relative standard deviation
QUANTILE_ACCURACY = 1000  # rank error ≤ 0.1%


def approx_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type approximate distinct users + exact row counts.

    Single pass, map-side partial HLL sketches merged at the reducer —
    the distinct keys themselves are never shuffled.
    """
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("approx_users"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


def approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p95/p99 of `value` via GK summaries."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.percentile_approx(
                "value", [0.5, 0.95, 0.99], QUANTILE_ACCURACY
            ).alias("quantiles")
        )
        .orderBy("event_type")
    )


def sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both sketch families in ONE single-pass aggregation per event type:
    HLL distinct users, exact counts, and GK p50/p95/p99 — flattened to
    scalar columns (an array terminal would crash the driver's pandas
    canonicalizer; scalar doubles hash cleanly)."""
    q = F.percentile_approx("value", [0.5, 0.95, 0.99], QUANTILE_ACCURACY)
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("approx_users"),
            F.count("*").alias("n"),
            q.alias("_q"),
        )
        .select(
            "event_type",
            "approx_users",
            "n",
            F.round(F.col("_q")[0], 6).alias("p50"),
            F.round(F.col("_q")[1], 6).alias("p95"),
            F.round(F.col("_q")[2], 6).alias("p99"),
        )
        .orderBy("event_type")
    )


# LOCAL rows-only (approximation ⇒ no cross-engine oracle; the
# error-bound contract lives in tests/test_sketches.py).  A rows-only
# entry can never earn a driver hash, so it lives in the standalone
# registry and its former driver slot certifies an oracled operator.
STANDALONE_QUERIES["sketch_profile"] = sketch_profile
