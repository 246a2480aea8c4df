"""Shared exactly-once commit bookkeeping for foreachBatch sinks.

Both stateful streaming sinks (the near-dup gate in ``neardup.py`` and
the materialized view in ``incremental.py``) maintain versioned
warehouse snapshots from micro-batches and need the same three guards:

1. the stream CHECKPOINT stops clean-restart re-reads;
2. a last-absorbed ``batch_id`` MARKER rejects re-delivery of a batch
   whose commit fully finished;
3. a pre-write INTENT record (batch_id + the pre-batch snapshot
   versions) covers the window the marker cannot — a crash AFTER a
   snapshot write committed but BEFORE the marker.  The re-delivered
   batch finds its own intent and rebuilds from the recorded base
   versions, so re-application REPLACES the partial commit instead of
   appending on top of it.  Snapshots are immutable, so the bases stay
   readable until vacuum.

All files are written atomically (tmp + rename) so a reader never sees
a torn marker/intent; on a real object store these become conditional
PUTs of the same tiny JSON objects.
"""

from __future__ import annotations

import json
import os

from data_ingestion_backend_spark.sources.warehouse import Warehouse


def _marker_path(wh: Warehouse, table: str) -> str:
    return os.path.join(wh.root, table, "_last_batch")


def _intent_path(wh: Warehouse, table: str) -> str:
    return os.path.join(wh.root, table, "_intent")


def write_atomic(path: str, payload: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, path)


def last_batch(wh: Warehouse, table: str) -> int:
    p = _marker_path(wh, table)
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        return int(f.read().strip())


def begin_batch(
    wh: Warehouse,
    table: str,
    batch_id: int,
    bases: dict[str, int],
    tables: dict[str, str] | None = None,
) -> dict[str, int]:
    """Record (or recover) the pre-batch base versions for ``batch_id``.

    Returns the base versions this batch must build on: the caller's
    ``bases`` on first delivery, or the versions recorded by a crashed
    earlier delivery of the SAME batch — so the re-run rebuilds from the
    same point instead of stacking onto its own partial commit.

    ``tables`` maps each alias key in ``bases`` to the PHYSICAL table
    name it versions (identity where omitted).  It is persisted in the
    intent so vacuum's ``_intent_pinned_versions`` can pin alias-keyed
    bases: a gate recording ``{"nd_index": v}`` was previously invisible
    to the pin matcher, leaving its crash-replay safety resting on the
    vacuum keep window — a convention, not a guarantee.  Every gate
    whose base keys differ from its table names must pass the map.
    """
    p = _intent_path(wh, table)
    if os.path.exists(p):
        with open(p) as f:
            intent = json.loads(f.read())
        if intent.get("batch_id") == batch_id:
            return {k: int(v) for k, v in intent["bases"].items()}
    payload: dict = {"batch_id": batch_id, "bases": bases}
    if tables:
        payload["tables"] = tables
    write_atomic(p, json.dumps(payload))
    return bases


def commit_batch(wh: Warehouse, table: str, batch_id: int) -> None:
    """Marker last, then drop the intent — the batch is now fully
    absorbed and any re-delivery is rejected by ``last_batch``."""
    write_atomic(_marker_path(wh, table), str(batch_id))
    p = _intent_path(wh, table)
    if os.path.exists(p):
        os.remove(p)
