"""Streaming materialized view: incremental state maintenance.

Ties the batch maintenance combinator
(:func:`~data_ingestion_backend_spark.operators.delta.merge_keyed_state`)
to Structured Streaming: each micro-batch is aggregated to delta state
and merged into a versioned warehouse snapshot — the streaming form of
"aggregate only the delta, never re-scan the base".  This is what a
100 TB per-user/per-domain totals table actually is in production: a
continuously-maintained materialized view, not a nightly full groupBy.

Exactly-once across crashes uses the three shared guards in
``streaming/txn.py``: the stream checkpoint (clean-restart re-reads),
the last-absorbed ``batch_id`` marker (post-commit re-delivery), and a
pre-write intent record pinning the pre-batch snapshot version — so a
crash AFTER the state write committed but BEFORE the marker makes the
re-delivered batch re-merge against the RECORDED base version instead
of double-counting on top of its own partial commit.

The state table is decomposable aggregates only (count/sum/min/max) —
exactly what ``merge_keyed_state`` merges associatively, so maintenance
order never changes the result (golden-tested in test_delta.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.delta import merge_keyed_state
from data_ingestion_backend_spark.sources.warehouse import Warehouse
from data_ingestion_backend_spark.streaming import txn

#: Aggregate shape of the maintained view (mirrors agg_incremental_merge).
def aggregate_user_totals(df: DataFrame) -> DataFrame:
    return df.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def last_applied_batch(wh: Warehouse, table: str) -> int:
    return txn.last_batch(wh, table)


def apply_delta_batch(
    wh: Warehouse, table: str, batch_df: DataFrame, batch_id: int
) -> bool:
    """Merge one micro-batch into the state snapshot, exactly once.

    Returns False (no-op) when ``batch_id`` was already absorbed (the
    post-commit re-delivery window, caught by the marker).  The crash
    window BETWEEN the state write and the marker is covered by the
    intent record: the re-delivered batch merges against the base
    version recorded before the first attempt's write, so the partial
    commit is replaced, never double-counted (see ``streaming/txn.py``).
    Each snapshot write is an atomic pointer swap, so readers never see
    a torn version at any crash point.
    """
    if batch_id <= last_applied_batch(wh, table):
        return False
    bases = txn.begin_batch(
        wh,
        table,
        batch_id,
        {"state": wh.current_version(table)},
        tables={"state": table},
    )
    base = bases["state"]
    delta = aggregate_user_totals(batch_df)
    if base < 0:
        merged = delta
    else:
        merged = merge_keyed_state(
            wh.read(table, base),
            delta,
            "user_id",
            sums=("n", "sum_value"),
            mins=("first_ts",),
            maxs=("last_ts",),
        )
    wh.write(table, merged)
    txn.commit_batch(wh, table, batch_id)
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
