"""Streaming ingestion: the landing-zone queue and event-time operators.

The reference decouples upload from processing with S3 + an SQS message
``{job_id, s3_key}`` consumed by an async worker (reference
``src/app/services/sqs_service.py:113-131``).  The Spark-native
re-expression keeps exactly that control/data split:

- **data plane**: the CSV file lands in the landing zone (object store).
- **control plane**: a tiny JSON *manifest* (job descriptor) lands in
  ``<landing>/_queue/`` — the SQS message, now a file.  A Structured
  Streaming ``readStream.json`` over the queue directory is the consumer;
  its checkpoint gives exactly-once manifest processing (St1/St3), and
  ``trigger(availableNow=True)`` gives drain-and-stop batch semantics with
  the same code path as continuous operation.

``foreachBatch`` collects only manifests (bytes-sized control records) to
the driver and runs the *distributed* batch ingest per file — the stream
never moves row data through the driver.  Batch and stream share
:func:`~data_ingestion_backend_spark.pipeline.ingest_file` verbatim — the
Structured Streaming premise (batch plan reuse).

Event-time operators (St4): watermarked tumbling windows and keep-first
dedup over the events stream, mirroring the batch-certified Q21/Q22.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_backend_spark.models import JobStatus
from data_ingestion_backend_spark.pipeline import ingest_file
from data_ingestion_backend_spark.sources.fixtures import normalize_event_time
from data_ingestion_backend_spark.sources.warehouse import Warehouse

MANIFEST_SCHEMA = "path string, user_id long, filename string, enqueued_at string"


def queue_dir(landing_dir: str) -> str:
    return os.path.join(landing_dir, "_queue")


def enqueue_file(landing_dir: str, path: str, user_id: int) -> str:
    """Publish a job manifest (the SQS ``send_message`` analogue, S7).

    Atomic rename ensures the stream never reads a half-written manifest.
    """
    qdir = queue_dir(landing_dir)
    os.makedirs(qdir, exist_ok=True)
    manifest = {
        "path": path,
        "user_id": user_id,
        "filename": os.path.basename(path),
        "enqueued_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    name = f"{int(time.time() * 1000)}-{uuid.uuid4().hex}.json"
    tmp = os.path.join(qdir, "." + name)
    with open(tmp, "w") as f:
        f.write(json.dumps(manifest))
    final = os.path.join(qdir, name)
    os.replace(tmp, final)
    return final


def process_queue(
    spark: SparkSession,
    wh: Warehouse,
    landing_dir: str,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> None:
    """Consume the manifest queue; run batch ingest per file (St1).

    ``availableNow`` drains everything currently enqueued and stops —
    repeated invocations with the same checkpoint never reprocess a
    manifest (exactly-once hand-off; re-delivery after a crash is
    absorbed by ingest idempotency, St3).
    """
    checkpoint_dir = checkpoint_dir or os.path.join(landing_dir, "_checkpoint")
    # the consumer may legitimately start before the first producer ever
    # enqueues — readStream refuses a nonexistent source directory
    os.makedirs(queue_dir(landing_dir), exist_ok=True)

    stream = (
        spark.readStream.schema(MANIFEST_SCHEMA)
        .json(queue_dir(landing_dir))
    )

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        # manifests are control-plane records: collecting them is O(files),
        # never O(rows) — the file contents are read distributed below.
        for m in batch_df.collect():
            try:
                ingest_file(
                    spark, wh, m["path"], m["user_id"], m["filename"],
                    reprocess=True,  # re-delivery safe
                )
            except Exception as exc:  # noqa: BLE001 — job-level failure isolation
                _record_failed_job(spark, wh, m, str(exc))
        # bound snapshot-version growth (readers pin paths, so dropping
        # all-but-recent versions after the batch is safe)
        for table in ("jobs", "staging", "issues", "issue_items", "contacts"):
            wh.vacuum(table, keep=3)

    writer = stream.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        writer.start()


def _record_failed_job(spark, wh: Warehouse, manifest, error: str) -> None:
    """A file that fails intake becomes a FAILED ledger row (St2), keeping
    the failure visible without poisoning the stream (the reference maps
    this to the saga rollback + 4xx; here the ledger is the source of truth).
    """
    import hashlib

    from data_ingestion_backend_spark.pipeline import _ledger_row

    job_id = hashlib.md5(
        f"{manifest['user_id']}|{manifest['filename']}".encode()
    ).hexdigest()
    row = _ledger_row(
        spark, job_id, manifest["user_id"], manifest["filename"],
        JobStatus.FAILED, total=0, processed=0, issues=0, error=error[:500],
    )
    cur = wh.read("jobs").filter(F.col("job_id") != job_id)
    wh.write("jobs", cur.unionByName(row))


# --------------------------------------------------------------------------
# Event-time operators (St4) — streaming twins of batch Q21/Q22
# --------------------------------------------------------------------------

def windowed_event_counts(
    events: DataFrame, watermark: str = "1 hour", window_len: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling-window aggregation (streaming Q22).

    Works on a streaming OR batch events DataFrame (same plan text — the
    batch run is the oracle-certified q22 modulo the window struct).
    Late data beyond the watermark is dropped by the state store; the
    decimal cast keeps sums exact, as in the batch twin.
    """
    return (
        normalize_event_time(events)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming gap-sessionization via native session_window (St4).

    The streaming twin of batch ``q30_sessionize``: a session closes after
    ``gap`` of inactivity per user; the watermark bounds state and decides
    when a session is final.  Same output grain: one row per
    (user, session) with start/end/count.
    """
    return (
        normalize_event_time(events)
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_docs_stream(
    doc_stream: DataFrame,
    corpus_hashes: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming corpus-ingestion gate: admit only genuinely NEW documents.

    Two dedup layers in one plan, the shape an always-on training-data
    intake runs:

    1. **within-stream**: ``dropDuplicatesWithinWatermark`` on the content
       hash — re-deliveries and duplicate uploads inside the watermark
       horizon collapse to one row, with state bounded by event time
       (never grows with corpus size);
    2. **against the corpus**: stream-static left-anti join on the
       existing corpus's content-hash index — the static side is
       re-scanned per micro-batch, so an index refresh (e.g. a nightly
       compaction adding the day's admissions) is picked up without
       restarting the query.

    ``doc_stream``: streaming (doc_id, ts, text, ...);
    ``corpus_hashes``: static (content_hash) — e.g.
    ``dedup_exact(...).filter("is_first").select("content_hash")``.
    At 100 TB the static side is a bucketed hash table, not a broadcast;
    the anti-join shuffles only the (tiny) per-batch arrivals.  Where a
    bounded false-positive rate is acceptable (quarantine-and-recheck
    flows), substitute the distributed Bloom gate
    (``operators.sketches.bloom_build`` / ``bloom_might_contain``): the
    static side shrinks from every corpus hash to the set-bit table.
    """
    hashed = normalize_event_time(doc_stream).withColumn(
        "content_hash", F.md5(F.col("text"))
    )
    fresh = hashed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
    return fresh.join(
        corpus_hashes.select("content_hash"), "content_hash", "left_anti"
    )


def dedup_events_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Keep-first streaming dedup on (user_id, event_type) (streaming Q21).

    ``dropDuplicatesWithinWatermark`` bounds state by event time — the
    streaming analogue of the row_number()=1 batch dedup; at 100 TB/day the
    watermark caps state instead of growing forever.
    """
    return (
        normalize_event_time(events)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
