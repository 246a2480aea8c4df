"""Streaming near-dup admission: micro-batches probe the persisted LSH index.

The streaming form of :func:`~data_ingestion_backend_spark.operators.dedup.
dedup_incremental_pairs` — an always-on intake where each arriving
micro-batch of documents is (a) signature-indexed with the exact
arithmetic the corpus index carries, (b) probed against that index for
near-dup pairs (new×corpus ∪ new×new, never corpus×corpus), and (c)
absorbed INTO the index so the next batch sees it — the continuously-
maintained version of the "nightly index compaction" the batch operator
models.  Complements ``pipeline.dedup_docs_stream`` (the EXACT-hash
admission gate): that one answers "is this byte-identical to something
we have", this one answers "is this a near-duplicate of something we
have".

Exactly-once uses three guards: the stream checkpoint stops
clean-restart re-reads; a last-absorbed ``batch_id`` marker absorbs
the post-commit foreachBatch re-delivery window; and a pre-write
INTENT record (batch_id + the pre-batch snapshot versions of both
tables) closes the window the marker alone leaves open — a crash
AFTER a table write committed but BEFORE the marker was written.  A
re-delivered batch that finds its own intent rebuilds both tables
from the recorded base versions, so re-application replaces the
partial commit instead of appending on top of it (idempotent under
any crash point; snapshots are immutable, so the base versions are
still readable).

Scale notes: the index tables are the per-doc signature frame (16
BIGINT minhashes + the distinct-shingle array used for exact-Jaccard
verification) and its banded projection; the per-batch cost is
|batch bands| bucket probes + a batch×batch self-join.  At 100 TB the
band join is against a bucketed table on (band_idx, band_key) and only
candidate docs' shingle arrays are fetched; the corpus is never
re-shingled.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_backend_spark.operators.dedup import (
    _band_table,
    dedup_incremental_pairs,
    minhash_per_doc_frame,
)
from data_ingestion_backend_spark.sources.warehouse import Warehouse

INDEX_TABLE = "neardup_index"
PAIRS_TABLE = "neardup_pairs"


def _marker_path(wh: Warehouse, name: str) -> str:
    return os.path.join(wh.root, name, "_last_batch")


def last_admitted_batch(wh: Warehouse, name: str = PAIRS_TABLE) -> int:
    p = _marker_path(wh, name)
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        return int(f.read().strip())


def _intent_path(wh: Warehouse) -> str:
    return os.path.join(wh.root, PAIRS_TABLE, "_intent")


def _read_intent(wh: Warehouse) -> dict | None:
    p = _intent_path(wh)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.loads(f.read())


def _write_atomic(path: str, payload: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, path)


def seed_index(wh: Warehouse, corpus_docs: DataFrame) -> None:
    """Build the initial corpus index from a static (doc_id, text) frame."""
    wh.write(INDEX_TABLE, minhash_per_doc_frame(corpus_docs))


def neardup_gate_batch(
    wh: Warehouse, batch_docs: DataFrame, batch_id: int
) -> bool:
    """Process one micro-batch: emit its near-dup pairs and absorb it
    into the index, exactly once.

    Returns False (no-op) on a re-delivered ``batch_id`` that already
    committed (marker check).  For the window the marker cannot cover —
    a crash AFTER the pairs and/or index write committed but BEFORE the
    marker — an intent record written before the first table write pins
    the pre-batch snapshot versions; the re-run reads THOSE versions
    (``wh.read(table, base)``) instead of the possibly-half-advanced
    current pointers, so its writes contain base + batch exactly once.
    Each individual snapshot write is itself atomic (pointer swap), so
    readers never see a torn table at any crash point.
    """
    if batch_id <= last_admitted_batch(wh):
        return False
    intent = _read_intent(wh)
    if intent is not None and intent["batch_id"] == batch_id:
        # crashed re-run of this very batch: rebuild from the recorded bases
        pairs_base, index_base = intent["pairs_base"], intent["index_base"]
    else:
        pairs_base = wh.current_version(PAIRS_TABLE)
        index_base = wh.current_version(INDEX_TABLE)
        _write_atomic(
            _intent_path(wh),
            json.dumps(
                {"batch_id": batch_id, "pairs_base": pairs_base, "index_base": index_base}
            ),
        )
    corpus_per_doc = (
        wh.read(INDEX_TABLE, index_base) if index_base >= 0 else wh.read(INDEX_TABLE)
    )
    corpus_bands = _band_table(corpus_per_doc)
    # Materialize once per batch: the per-doc frame feeds its own band
    # projection, the candidate join, and the index append — without a
    # local pin the collect_list aggregation would run three times.
    batch_per_doc = minhash_per_doc_frame(batch_docs).localCheckpoint(eager=True)
    pairs = dedup_incremental_pairs(
        batch_per_doc,
        _band_table(batch_per_doc),
        corpus_bands,
        corpus_per_doc,
    )
    if pairs_base < 0:
        wh.write(PAIRS_TABLE, pairs)
    else:
        wh.write(PAIRS_TABLE, wh.read(PAIRS_TABLE, pairs_base).unionByName(pairs))
    wh.write(INDEX_TABLE, corpus_per_doc.unionByName(batch_per_doc))
    _write_atomic(_marker_path(wh, PAIRS_TABLE), str(batch_id))
    os.remove(_intent_path(wh))
    return True


def maintain_neardup_pairs(
    spark: SparkSession,
    wh: Warehouse,
    docs_dir: str,
    checkpoint_dir: str,
    schema=None,
) -> None:
    """Drain the arriving-docs directory through the near-dup gate
    (availableNow semantics — same code path as continuous operation)."""
    if schema is None:
        schema = spark.read.parquet(docs_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda batch_df, batch_id: neardup_gate_batch(wh, batch_df, batch_id)
        )
        .start()
    )
    q.awaitTermination()
