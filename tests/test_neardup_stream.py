"""Streaming near-dup admission gate (streaming/neardup.py).

The pairs accumulated across micro-batches must equal the batch
`dedup_incremental` result over the same new-doc set — cross-batch pairs
are caught when the LATER doc arrives because each batch is absorbed into
the index before the next probes it.  Plus the two exactly-once guards:
checkpoint re-drain is a no-op, and a re-delivered batch_id neither
duplicates pairs nor double-inserts index rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR_ORACLE
from data_ingestion_backend_spark.operators.dedup import dedup_incremental
from data_ingestion_backend_spark.sources.fixtures import load_table
from data_ingestion_backend_spark.sources.warehouse import Warehouse
from data_ingestion_backend_spark.streaming.neardup import (
    INDEX_TABLE,
    PAIRS_TABLE,
    last_admitted_batch,
    maintain_neardup_pairs,
    neardup_gate_batch,
    seed_index,
)


def _pairs_set(df):
    return {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in df.collect()}


def _setup(spark, tmp_path):
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    seed_index(wh, corpus)
    sdir = str(tmp_path / "docs_stream")
    # three part-files so maxFilesPerTrigger=1 forces three probes with
    # index growth in between (cross-batch pairs exist iff this matters)
    for i in range(3):
        new.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(sdir)
    return wh, sdir, new


def test_streamed_pairs_equal_batch_incremental(spark, tmp_path):
    wh, sdir, _ = _setup(spark, tmp_path)
    maintain_neardup_pairs(spark, wh, sdir, str(tmp_path / "ckpt"))
    assert last_admitted_batch(wh) >= 2, "expected three micro-batches"

    got = _pairs_set(wh.read(PAIRS_TABLE))
    want = _pairs_set(dedup_incremental(spark, SF_DIR_ORACLE))
    assert got == want
    assert got, "fixture produced no pairs — test is vacuous"
    # the index absorbed every arrival exactly once
    n_index = wh.read(INDEX_TABLE).count()
    n_docs = load_table(spark, SF_DIR_ORACLE, "documents").count()
    assert n_index == n_docs


def test_redrain_same_checkpoint_is_noop(spark, tmp_path):
    wh, sdir, _ = _setup(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    maintain_neardup_pairs(spark, wh, sdir, ckpt)
    v_pairs = wh.current_version(PAIRS_TABLE)
    v_index = wh.current_version(INDEX_TABLE)
    maintain_neardup_pairs(spark, wh, sdir, ckpt)
    assert wh.current_version(PAIRS_TABLE) == v_pairs
    assert wh.current_version(INDEX_TABLE) == v_index


def test_redelivered_batch_rejected(spark, tmp_path):
    """The crash window: pairs+index written, checkpoint not committed —
    Spark re-runs the same batch_id; the marker guard must reject it."""
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    seed_index(wh, corpus)

    assert neardup_gate_batch(wh, new, batch_id=0) is True
    pairs_after = _pairs_set(wh.read(PAIRS_TABLE))
    index_after = wh.read(INDEX_TABLE).count()

    # re-delivery: same batch id → no-op, state bit-identical
    assert neardup_gate_batch(wh, new, batch_id=0) is False
    assert _pairs_set(wh.read(PAIRS_TABLE)) == pairs_after
    assert wh.read(INDEX_TABLE).count() == index_after


def test_crash_between_table_write_and_marker_is_idempotent(spark, tmp_path, monkeypatch):
    """The window the marker alone cannot cover: both snapshot writes
    committed, then the process died BEFORE the marker write.  The
    re-delivered batch finds the intent record and rebuilds from the
    recorded base versions — final state must be bit-identical to a
    single clean run, with no duplicated pairs or double-inserted docs."""
    from data_ingestion_backend_spark.streaming import txn

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)

    # clean single-run reference state
    wh_ref = Warehouse(spark, str(tmp_path / "wh_ref"))
    seed_index(wh_ref, corpus)
    assert neardup_gate_batch(wh_ref, new, batch_id=0) is True
    want_pairs = _pairs_set(wh_ref.read(PAIRS_TABLE))
    want_index = wh_ref.read(INDEX_TABLE).count()

    # crashed run: kill the process right before the marker write — by
    # then BOTH table versions have committed via their pointer swaps
    wh = Warehouse(spark, str(tmp_path / "wh"))
    seed_index(wh, corpus)

    class Boom(RuntimeError):
        pass

    real_write_atomic = txn.write_atomic

    def crash_on_marker(path, payload):
        if path.endswith("_last_batch"):
            raise Boom("simulated crash before marker write")
        real_write_atomic(path, payload)

    monkeypatch.setattr(txn, "write_atomic", crash_on_marker)
    try:
        neardup_gate_batch(wh, new, batch_id=0)
    except Boom:
        pass
    monkeypatch.setattr(txn, "write_atomic", real_write_atomic)

    # partial commit is visible (this is exactly the hazard): tables
    # advanced, marker did not
    assert wh.current_version(PAIRS_TABLE) >= 0
    assert last_admitted_batch(wh) == -1
    assert wh.read(INDEX_TABLE).count() > want_index - new.count()  # index absorbed

    # re-delivery of the same batch_id must REPLACE, not re-append
    assert neardup_gate_batch(wh, new, batch_id=0) is True
    assert _pairs_set(wh.read(PAIRS_TABLE)) == want_pairs
    assert wh.read(PAIRS_TABLE).count() == len(want_pairs)  # no dup rows either
    assert wh.read(INDEX_TABLE).count() == want_index
    assert last_admitted_batch(wh) == 0


def test_crash_on_first_batch_unseeded_is_idempotent(spark, tmp_path, monkeypatch):
    """The base=-1 arm of the crash window: the FIRST batch on an
    unseeded warehouse commits its index/bands/pairs writes, then dies
    before the marker.  The recorded bases are all -1, so the re-run
    must read the EMPTY typed frames — not the current pointer, which by
    then holds the crashed batch's own rows (reading it made the rerun
    treat its own write as the corpus: every index row duplicated and
    each in-batch pair re-emitted as a spurious new×corpus pair)."""
    from data_ingestion_backend_spark.streaming import txn

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)

    # clean single-run reference state (unseeded: corpus is empty)
    wh_ref = Warehouse(spark, str(tmp_path / "wh_ref"))
    assert neardup_gate_batch(wh_ref, new, batch_id=0) is True
    want_pairs = _pairs_set(wh_ref.read(PAIRS_TABLE))
    want_index = wh_ref.read(INDEX_TABLE).count()

    wh = Warehouse(spark, str(tmp_path / "wh"))

    class Boom(RuntimeError):
        pass

    real_write_atomic = txn.write_atomic

    def crash_on_marker(path, payload):
        if path.endswith("_last_batch"):
            raise Boom("simulated crash before marker write")
        real_write_atomic(path, payload)

    monkeypatch.setattr(txn, "write_atomic", crash_on_marker)
    try:
        neardup_gate_batch(wh, new, batch_id=0)
    except Boom:
        pass
    monkeypatch.setattr(txn, "write_atomic", real_write_atomic)

    # hazard is live: the index committed, the marker did not
    assert wh.read(INDEX_TABLE).count() == want_index
    assert last_admitted_batch(wh) == -1

    # re-delivery must rebuild from the pinned EMPTY base, exactly once
    assert neardup_gate_batch(wh, new, batch_id=0) is True
    assert wh.read(INDEX_TABLE).count() == want_index  # no doubled rows
    assert _pairs_set(wh.read(PAIRS_TABLE)) == want_pairs
    assert wh.read(PAIRS_TABLE).count() == len(want_pairs)
    assert last_admitted_batch(wh) == 0


def test_index_stats_sidecar_tracks_versions(spark, tmp_path):
    """The verify-path routing stat is served from the persisted sidecar
    — version-matched, no O(index) aggregation per batch — and is kept
    current by seed and by every absorbed batch."""
    from data_ingestion_backend_spark.streaming.neardup import (
        _index_max_n,
        _stats_path,
    )
    import json
    import os

    wh, _, new = _setup(spark, tmp_path)  # _setup already seeds the index
    assert os.path.exists(_stats_path(wh))
    stats = json.loads(open(_stats_path(wh)).read())
    assert stats["version"] == wh.current_version(INDEX_TABLE)
    true_max = (
        wh.read(INDEX_TABLE).agg(F.max("n")).collect()[0][0] or 0
    )
    assert stats["max_n"] == true_max
    # version-matched read never touches the frame: passing a non-frame
    # sentinel proves no aggregation job runs on the hit path
    assert _index_max_n(wh, None, stats["version"]) == true_max

    assert neardup_gate_batch(wh, new, batch_id=0) is True
    stats2 = json.loads(open(_stats_path(wh)).read())
    assert stats2["version"] == wh.current_version(INDEX_TABLE)
    assert stats2["max_n"] >= true_max


def test_unseeded_stream_reads_empty_corpus(spark, tmp_path):
    """A gate run on a warehouse where seed_index was never called must
    treat the corpus as empty (admit everything, emit only new×new
    pairs) — not raise KeyError('neardup_index')."""
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    assert neardup_gate_batch(wh, new, batch_id=0) is True
    got = _pairs_set(wh.read(PAIRS_TABLE))
    # every emitted pair is new×new
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    assert all(a in new_ids and b in new_ids for a, b, _ in got)
    assert wh.read(INDEX_TABLE).count() == len(new_ids)
