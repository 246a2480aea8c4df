"""Streaming materialized view: incremental state maintenance.

Ties the batch maintenance combinator
(:func:`~data_ingestion_backend_spark.operators.delta.merge_keyed_state`)
to Structured Streaming: each micro-batch is aggregated to delta state
and merged into a versioned warehouse snapshot — the streaming form of
"aggregate only the delta, never re-scan the base".  This is what a
100 TB per-user/per-domain totals table actually is in production: a
continuously-maintained materialized view, not a nightly full groupBy.

Exactly-once across crashes needs TWO guards, and they cover different
failure windows:

1. the stream CHECKPOINT stops a drained micro-batch from being read
   again after a clean restart;
2. the state snapshot records the ``batch_id`` it last absorbed, so the
   foreachBatch re-delivery window (crash AFTER the state write but
   BEFORE the checkpoint commit — Spark re-runs that batch) is absorbed
   by an idempotency check instead of double-counting.  This is the
   same write-then-commit discipline the ingest pipeline uses
   (``pipeline.ingest_file`` + replace-per-job), applied to aggregate
   state: merging batch N twice is detected by N ≤ last_applied.

The state table is decomposable aggregates only (count/sum/min/max) —
exactly what ``merge_keyed_state`` merges associatively, so maintenance
order never changes the result (golden-tested in test_delta.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.delta import merge_keyed_state
from data_ingestion_backend_spark.sources.warehouse import Warehouse

#: Aggregate shape of the maintained view (mirrors agg_incremental_merge).
def aggregate_user_totals(df: DataFrame) -> DataFrame:
    return df.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def _marker_path(wh: Warehouse, table: str) -> str:
    return os.path.join(wh.root, table, "_last_batch")


def last_applied_batch(wh: Warehouse, table: str) -> int:
    p = _marker_path(wh, table)
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        return int(f.read().strip())


def apply_delta_batch(
    wh: Warehouse, table: str, batch_df: DataFrame, batch_id: int
) -> bool:
    """Merge one micro-batch into the state snapshot, exactly once.

    Returns False (no-op) when ``batch_id`` was already absorbed — the
    foreachBatch re-delivery window.  Write order is state-snapshot
    first, marker last: a crash between the two re-delivers the batch,
    the marker check rejects it, and the committed snapshot stays
    correct (the snapshot pointer swap itself is atomic, so readers
    never see a torn version).
    """
    if batch_id <= last_applied_batch(wh, table):
        return False
    delta = aggregate_user_totals(batch_df)
    if wh.current_version(table) < 0:
        merged = delta
    else:
        merged = merge_keyed_state(
            wh.read(table),
            delta,
            "user_id",
            sums=("n", "sum_value"),
            mins=("first_ts",),
            maxs=("last_ts",),
        )
    wh.write(table, merged)
    marker = _marker_path(wh, table)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(batch_id))
    os.replace(tmp, marker)
    return True


def maintain_user_totals(
    spark: SparkSession,
    wh: Warehouse,
    events_dir: str,
    checkpoint_dir: str,
    table: str = "user_totals",
    schema=None,
) -> None:
    """Drain the events directory stream into the maintained totals
    snapshot (availableNow semantics: drain-and-stop, same code path as
    continuous operation)."""
    from data_ingestion_backend_spark.sources.fixtures import (
        normalize_event_time,
    )

    if schema is None:
        schema = spark.read.parquet(events_dir).schema
    stream = normalize_event_time(
        spark.readStream.schema(schema)
        # bound micro-batch size: at scale one giant drain batch defeats
        # the point of incremental maintenance (and its memory bounds)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        apply_delta_batch(wh, table, batch_df, batch_id)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
