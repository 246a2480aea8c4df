"""Stream-stream joins: watermarked event-time attribution.

The missing fourth St4 shape: joining two live streams.  The canonical
use is purchase→click attribution — match each purchase to the clicks
the same user made in the preceding attribution horizon.

Spark's stream-stream join requires BOTH a watermark on each side and an
event-time range constraint in the join condition; together they bound
the join state the executors must hold (clicks older than
``watermark + horizon`` can never match a future purchase and are
evicted).  Without the range constraint the state grows forever — the
constraint is a correctness requirement of the operator, not an
optimization.

State scale: per user, clicks within the horizon window — O(click rate ×
horizon), independent of stream lifetime.  The join shuffles both sides
by user_id, the same partitioning sessionization and the as-of join use.

The batch twin (`attribute_purchases_batch`) runs the identical join
condition on static DataFrames; the equivalence test drives both from
one fixture and asserts identical match sets — and q32_range_join's
DuckDB oracle certifies the aggregated form of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_HORIZON = "10 minutes"


def _sides(clicks: DataFrame, purchases: DataFrame) -> tuple[DataFrame, DataFrame]:
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return c, p


_JOIN_COND = """
    c_user = p_user
    AND c_ts >= p_ts - INTERVAL 10 MINUTES
    AND c_ts <  p_ts
"""


def attribute_purchases_stream(
    clicks: DataFrame, purchases: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Stream⋈stream: clicks within the 10-min window before each purchase.

    Inner join ⇒ rows emit as soon as both sides arrive; the watermarks +
    range bound exist to EVICT state, so a drained availableNow run emits
    exactly the batch answer (asserted by the equivalence test).
    """
    c, p = _sides(clicks, purchases)
    return (
        p.withWatermark("p_ts", watermark)
        .join(c.withWatermark("c_ts", watermark), F.expr(_JOIN_COND))
        .select("purchase_id", "click_id", F.col("p_user").alias("user_id"), "p_ts", "c_ts")
    )


def attribute_purchases_batch(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Batch twin: same condition, static inputs (differential truth)."""
    c, p = _sides(clicks, purchases)
    return p.join(c, F.expr(_JOIN_COND)).select(
        "purchase_id", "click_id", F.col("p_user").alias("user_id"), "p_ts", "c_ts"
    )
