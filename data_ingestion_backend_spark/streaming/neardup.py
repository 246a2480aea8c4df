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
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.dedup import (
    _band_table,
    dedup_incremental_pairs,
    minhash_per_doc_frame,
)
from data_ingestion_backend_spark.sources.warehouse import Warehouse
from data_ingestion_backend_spark.streaming import txn

INDEX_TABLE = "neardup_index"
PAIRS_TABLE = "neardup_pairs"
BANDS_TABLE = "neardup_bands"
_STATS_FILE = "_stats"


def _stats_path(wh: Warehouse) -> str:
    return os.path.join(wh.root, INDEX_TABLE, _STATS_FILE)


def _write_index_stats(wh: Warehouse, version: int, max_n: int) -> None:
    txn.write_atomic(
        _stats_path(wh), json.dumps({"version": version, "max_n": max_n})
    )


def _index_max_n(wh: Warehouse, per_doc: DataFrame, version: int) -> int:
    """max distinct-shingle count of the corpus index, from the persisted
    stats sidecar when it matches ``version``; an aggregation over the
    pinned frame otherwise (legacy/unseeded warehouses, or a crash
    recovery whose stats ran ahead of the pinned base — one-off cost).
    The stat routes the bit-equal verify-path choice only, so it must be
    version-exact merely to avoid an UNDER-estimate of a shrunken corpus
    — and the index only ever grows."""
    p = _stats_path(wh)
    if os.path.exists(p):
        with open(p) as f:
            stats = json.loads(f.read())
        if stats.get("version") == version:
            return int(stats["max_n"])
    return per_doc.agg(F.max("n")).collect()[0][0] or 0


def last_admitted_batch(wh: Warehouse, name: str = PAIRS_TABLE) -> int:
    return txn.last_batch(wh, name)


def seed_index(wh: Warehouse, corpus_docs: DataFrame) -> None:
    """Build the initial corpus index from a static (doc_id, text) frame.

    Writes BOTH persisted forms: the per-doc signature frame (minhashes +
    shingle arrays, used for exact-Jaccard verification) and its band
    projection (the probe table).  Persisting the bands is what makes the
    per-batch probe cost O(batch + candidates): without it every batch
    would re-derive 16 md5 band keys per CORPUS doc — O(index) recompute
    per batch, the growth the 100-batch soak (tools/streamsoak.py)
    measures.  At 100 TB the band table is bucketed on (band_idx,
    band_key) so the probe join is bucket-pruned, not scanned.
    """
    per_doc = minhash_per_doc_frame(corpus_docs).localCheckpoint(eager=True)
    v = wh.write(INDEX_TABLE, per_doc)
    wh.write(BANDS_TABLE, _band_table(per_doc))
    _write_index_stats(
        wh, v, per_doc.agg(F.max("n")).collect()[0][0] or 0
    )


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
    bases = txn.begin_batch(
        wh,
        PAIRS_TABLE,
        batch_id,
        {
            "pairs": wh.current_version(PAIRS_TABLE),
            "index": wh.current_version(INDEX_TABLE),
            "bands": wh.current_version(BANDS_TABLE),
        },
        tables={
            "pairs": PAIRS_TABLE,
            "index": INDEX_TABLE,
            "bands": BANDS_TABLE,
        },
    )
    pairs_base, index_base = bases["pairs"], bases["index"]
    bands_base = bases.get("bands", -1)
    # Read the PINNED base unconditionally — never the current pointer.
    # ``Warehouse.read(table, -1)`` returns the empty typed frame (the
    # neardup schemas are registered in models.SCHEMAS for exactly this),
    # so a re-delivered FIRST batch whose crash landed after the index
    # write sees an empty corpus, not its own half-committed write — the
    # current-pointer fallback here duplicated every index row on that
    # crash path (corpus ∪ batch = batch twice).
    corpus_per_doc = wh.read(INDEX_TABLE, index_base)
    # persisted probe table (see seed_index); legacy warehouses whose
    # index predates the band table fall back to deriving it from the
    # pinned per-doc frame (one-off; empty base → empty bands)
    corpus_bands = (
        wh.read(BANDS_TABLE, bands_base)
        if bands_base >= 0
        else _band_table(corpus_per_doc)
    )
    # Materialize once per batch: the per-doc frame feeds its own band
    # projection, the candidate join, and the index append — without a
    # local pin the collect_list aggregation would run three times.
    batch_per_doc = minhash_per_doc_frame(batch_docs).localCheckpoint(eager=True)
    batch_bands = _band_table(batch_per_doc)
    # verify-path routing stat: max over (persisted corpus stat, O(batch)
    # batch aggregation) — never an O(index) scan per batch
    batch_max_n = batch_per_doc.agg(F.max("n")).collect()[0][0] or 0
    max_n = max(batch_max_n, _index_max_n(wh, corpus_per_doc, index_base))
    pairs = dedup_incremental_pairs(
        batch_per_doc,
        batch_bands,
        corpus_bands,
        corpus_per_doc,
        max_n=max_n,
    )
    # grow-only tables append at the FILE level (base hard-linked, only
    # the batch delta written) — per-batch write cost O(batch), not
    # O(index); the union-rewrite form turns a grown index into an
    # O(corpus) rewrite per batch (tools/corpussoak.py --arm admission)
    wh.write_append(PAIRS_TABLE, pairs, pairs_base)
    new_index_v = wh.write_append(INDEX_TABLE, batch_per_doc, index_base)
    if bands_base >= 0 or index_base < 0:
        wh.write_append(BANDS_TABLE, batch_bands, bands_base)
    else:  # pre-bands warehouse: base only exists derived from the index
        wh.write(BANDS_TABLE, corpus_bands.unionByName(batch_bands))
    _write_index_stats(wh, new_index_v, max_n)
    txn.commit_batch(wh, PAIRS_TABLE, batch_id)
    compact_neardup_state(wh)
    return True


def compact_neardup_state(wh: Warehouse, max_files: int = 64) -> list[str]:
    """Scheduled compaction for the gate's append-maintained tables:
    file-level appends keep per-batch writes O(batch) but accumulate one
    file set per batch; this trigger (checked after every commit —
    normally a cheap stat) rewrites any table past ``max_files`` into
    one snapshot, bounding reader file counts for a gate that runs for
    months.  Compaction publishes EQUAL state atomically, so crash/
    replay arguments are untouched.  The max-n stats sidecar is re-keyed
    to the compacted index version (content equal, version moved) —
    sidecar hit via the pre-compact version, so the re-key is scan-free."""
    done = []
    for t in (PAIRS_TABLE, INDEX_TABLE, BANDS_TABLE):
        prev = wh.current_version(t)
        v = wh.compact_if_needed(t, max_files=max_files)
        if v is not None:
            done.append(t)
            if t == INDEX_TABLE:
                _write_index_stats(
                    wh, v, _index_max_n(wh, wh.read(t, v), prev)
                )
    return done


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
