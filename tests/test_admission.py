"""Composed streaming corpus admission (streaming/admission.py): one
exactly-once decision per micro-batch across the near-dup gate, the
semantic gate, and the DSIR state — planted-dup goldens, streamed ≡
direct, re-delivery, crash healing."""

from __future__ import annotations

import os

import numpy as np

from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.mlprep import (
    DSIR_STATE_TABLE,
    _dsir_state,
)
from data_ingestion_backend_spark.sources.warehouse import Warehouse
from data_ingestion_backend_spark.streaming.admission import (
    ADMISSIONS_TABLE,
    admission_gate_batch,
    attach_admission_stream,
    last_admitted_batch,
)
from data_ingestion_backend_spark.streaming.neardup import (
    INDEX_TABLE,
    )
from data_ingestion_backend_spark.streaming.semgate import SEM_INDEX_TABLE

DIM = 8
BATCH_SCHEMA = "doc_id long, lang string, text string, e array<double>"


def _text(i: int) -> str:
    return " ".join(f"t{i}{c}" for c in "abcdefghijkl")


def _vecs(n: int, seed: int = 11) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    V = rng.standard_normal((n, DIM))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    # the synthetic corpus must not contain ACCIDENTAL semantic dups
    G = V @ V.T
    np.fill_diagonal(G, 0.0)
    assert G.max() < 0.9, "seed produced an accidental near-parallel pair"
    return [row.tolist() for row in V]


def _batches(spark):
    E = _vecs(40)
    b0 = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de", _text(i), E[i]) for i in range(20)],
        BATCH_SCHEMA,
    )
    b1 = spark.createDataFrame(
        [
            (20, "en", _text(20), E[20]),
            (21, "de", _text(21), E[21]),
            # near-dup of corpus doc 3, fresh embedding
            (30, "en", _text(3), E[22]),
            # semantic dup of corpus doc 5 (scaled copy), fresh text
            (31, "en", _text(31), [2.0 * x for x in E[5]]),
            # both gates at once
            (32, "de", _text(7), [3.0 * x for x in E[7]]),
            # fresh pair with identical text: keep-lowest-id within batch
            (33, "en", _text(33), E[23]),
            (34, "en", _text(33), E[24]),
        ],
        BATCH_SCHEMA,
    )
    b2 = spark.createDataFrame(
        [
            # near-dups ADMITTED doc 33 (34 was rejected and absorbed
            # nowhere — admitted-only absorption is what makes this pair)
            (40, "en", _text(33), E[25]),
            (41, "de", _text(41), E[26]),
            (42, "en", _text(42), E[27]),
        ],
        BATCH_SCHEMA,
    )
    return b0, b1, b2


EXPECT = {
    30: (False, "near_dup"),
    31: (False, "semantic_dup"),
    32: (False, "near_dup,semantic_dup"),
    33: (True, ""),
    34: (False, "near_dup"),
    40: (False, "near_dup"),
}


def _run_direct(spark, wh):
    b0, b1, b2 = _batches(spark)
    for i, b in enumerate((b0, b1, b2)):
        assert admission_gate_batch(wh, b, i) is True
    return b0, b1, b2


def _ledger(wh):
    return {
        r["doc_id"]: (r["batch_id"], r["admitted"], r["reason"])
        for r in wh.read(ADMISSIONS_TABLE).collect()
    }


def test_planted_dupes_rejected_with_reasons(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    b0, b1, b2 = _run_direct(spark, wh)
    led = _ledger(wh)
    assert len(led) == 30
    for doc, (adm, reason) in EXPECT.items():
        assert led[doc][1] is adm, (doc, led[doc])
        assert led[doc][2] == reason, (doc, led[doc])
    # everything unplanted is admitted
    assert all(v[1] for d, v in led.items() if d not in EXPECT)

    admitted = {d for d, v in led.items() if v[1]}
    # admitted-only absorption: both indexes hold exactly the admitted set
    assert {r["doc_id"] for r in wh.read(INDEX_TABLE).collect()} == admitted
    assert {r["vec_id"] for r in wh.read(SEM_INDEX_TABLE).collect()} == admitted

    # DSIR state == one-shot histograms over the admitted docs (integer
    # bit-equality, the mergeable-state contract)
    all_docs = b0.unionByName(b1).unionByName(b2).filter(
        F.col("doc_id").isin(sorted(admitted))
    )
    want = {
        (r["side"], r["b"]): r["k"]
        for r in _dsir_state(
            all_docs.select("text"),
            all_docs.filter(F.col("lang") == "en").select("text"),
        ).collect()
    }
    got = {
        (r["side"], r["b"]): r["k"]
        for r in wh.read(DSIR_STATE_TABLE).collect()
    }
    assert got == want


def test_streamed_equals_direct(spark, tmp_path):
    wh_ref = Warehouse(spark, str(tmp_path / "wh_ref"))
    _run_direct(spark, wh_ref)

    wh = Warehouse(spark, str(tmp_path / "wh_stream"))
    sdir = str(tmp_path / "doc_stream")
    os.makedirs(sdir)
    # deterministic delivery order without wall-clock sleeps (the old
    # sleep(1.1) trick was flaky on coarse-mtime filesystems): each
    # batch becomes ONE monotonically named file whose mtime is STAMPED
    # explicitly, so the source's (timestamp, listing) order equals
    # batch order on any filesystem
    base_ts = 1_600_000_000
    for i, b in enumerate(_batches(spark)):
        stage = str(tmp_path / f"stage_{i}")
        b.coalesce(1).write.mode("overwrite").parquet(stage)
        [part] = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        dst = os.path.join(sdir, f"batch-{i:04d}.parquet")
        os.replace(os.path.join(stage, part), dst)
        os.utime(dst, (base_ts + i, base_ts + i))
    stream = (
        spark.readStream.schema(BATCH_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(sdir)
    )
    q = attach_admission_stream(wh, stream, str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert last_admitted_batch(wh) == 2

    assert _ledger(wh) == _ledger(wh_ref)
    for table, key in ((INDEX_TABLE, "doc_id"), (SEM_INDEX_TABLE, "vec_id")):
        assert {r[key] for r in wh.read(table).collect()} == {
            r[key] for r in wh_ref.read(table).collect()
        }
    assert {
        (r["side"], r["b"]): r["k"] for r in wh.read(DSIR_STATE_TABLE).collect()
    } == {
        (r["side"], r["b"]): r["k"]
        for r in wh_ref.read(DSIR_STATE_TABLE).collect()
    }


def test_redelivered_batch_is_noop(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    b0, b1, _ = _batches(spark)
    assert admission_gate_batch(wh, b0, 0) is True
    led = _ledger(wh)
    v = wh.current_version(ADMISSIONS_TABLE)
    assert admission_gate_batch(wh, b0, 0) is False
    assert admission_gate_batch(wh, b1.limit(1), 0) is False  # same id, any content
    assert wh.current_version(ADMISSIONS_TABLE) == v
    assert _ledger(wh) == led


def test_empty_epoch_is_a_committed_noop(spark, tmp_path):
    """An idle source delivers empty micro-batches; the gate must commit
    them (the marker advances — exactly-once bookkeeping) while changing
    no state, and keep gating normally afterwards."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    b0, b1, b2 = _batches(spark)
    assert admission_gate_batch(wh, b0, 0) is True
    led = _ledger(wh)
    assert admission_gate_batch(wh, b0.limit(0), 1) is True
    assert last_admitted_batch(wh) == 1
    assert _ledger(wh) == led
    assert admission_gate_batch(wh, b1, 2) is True
    assert last_admitted_batch(wh) == 2
    assert len(_ledger(wh)) > len(led)


def test_crash_before_marker_heals_from_pinned_bases(spark, tmp_path, monkeypatch):
    from data_ingestion_backend_spark.streaming import txn

    wh_ref = Warehouse(spark, str(tmp_path / "wh_ref"))
    _run_direct(spark, wh_ref)

    wh = Warehouse(spark, str(tmp_path / "wh"))
    b0, b1, b2 = _batches(spark)
    assert admission_gate_batch(wh, b0, 0) is True

    class Boom(RuntimeError):
        pass

    real_write_atomic = txn.write_atomic

    def crash_on_marker(path, payload):
        if path.endswith("_last_batch"):
            raise Boom("simulated crash before marker write")
        real_write_atomic(path, payload)

    monkeypatch.setattr(txn, "write_atomic", crash_on_marker)
    try:
        admission_gate_batch(wh, b1, 1)
    except Boom:
        pass
    monkeypatch.setattr(txn, "write_atomic", real_write_atomic)

    assert last_admitted_batch(wh) == 0  # marker missing: hazard live
    assert admission_gate_batch(wh, b1, 1) is True  # heals from pinned bases
    assert admission_gate_batch(wh, b2, 2) is True
    assert _ledger(wh) == _ledger(wh_ref)
    assert {r["doc_id"] for r in wh.read(INDEX_TABLE).collect()} == {
        r["doc_id"] for r in wh_ref.read(INDEX_TABLE).collect()
    }


def test_empty_first_epoch_is_a_committed_noop(spark, tmp_path):
    """An idle source at STREAM START delivers an empty epoch before the
    quantizer has ever been seeded: the gate must commit it as a no-op
    (marker advances, no state published) instead of handing a zero-row
    sample to the centroid trainer, and then seed + gate normally on the
    first non-empty epoch."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    b0, b1, b2 = _batches(spark)
    assert admission_gate_batch(wh, b0.limit(0), 0) is True
    assert last_admitted_batch(wh) == 0
    assert wh.current_version(ADMISSIONS_TABLE) == -1  # nothing published
    # the build proceeds normally: seed on the first real batch, gate on
    assert admission_gate_batch(wh, b0, 1) is True
    assert admission_gate_batch(wh, b1, 2) is True
    led = _ledger(wh)
    for doc, (adm, reason) in EXPECT.items():
        if doc in led and doc < 40:
            assert led[doc][1:] == (adm, reason)


def test_vacuum_in_crash_window_keeps_alias_pinned_bases(
    spark, tmp_path, monkeypatch
):
    """The alias-path version of the vacuum pin golden: the admission
    gate records its intent bases under ALIAS keys (nd_index, sem_pairs,
    ...), so before the intent carried a table-name map an aggressive
    vacuum inside the crash window could delete a pinned base and turn
    the heal into a read of a removed directory.  Now the intent's
    `tables` map makes `_intent_pinned_versions` match every gate:
    crash → vacuum(keep=1) on every state table → redelivery still heals
    to the reference ledger and index."""
    from data_ingestion_backend_spark.streaming import txn
    from data_ingestion_backend_spark.streaming.neardup import (
        BANDS_TABLE,
        PAIRS_TABLE as ND_PAIRS_TABLE_RAW,
    )

    wh_ref = Warehouse(spark, str(tmp_path / "wh_ref"))
    _run_direct(spark, wh_ref)

    wh = Warehouse(spark, str(tmp_path / "wh"))
    b0, b1, b2 = _batches(spark)
    assert admission_gate_batch(wh, b0, 0) is True

    class Boom(RuntimeError):
        pass

    real_write_atomic = txn.write_atomic

    def crash_on_marker(path, payload):
        if path.endswith("_last_batch"):
            raise Boom("simulated crash before marker write")
        real_write_atomic(path, payload)

    monkeypatch.setattr(txn, "write_atomic", crash_on_marker)
    try:
        admission_gate_batch(wh, b1, 1)
    except Boom:
        pass
    monkeypatch.setattr(txn, "write_atomic", real_write_atomic)
    assert last_admitted_batch(wh) == 0  # intent live, marker missing

    # the partial commit advanced the state tables past their pinned
    # bases — an aggressive vacuum must keep the pinned versions
    intent_pinned = wh._intent_pinned_versions(INDEX_TABLE)
    assert intent_pinned, "alias-keyed intent must pin the index base"
    for t in (
        INDEX_TABLE,
        BANDS_TABLE,
        ND_PAIRS_TABLE_RAW,
        SEM_INDEX_TABLE,
        ADMISSIONS_TABLE,
        DSIR_STATE_TABLE,
    ):
        wh.vacuum(t, keep=1)
    for v in intent_pinned:
        assert os.path.isdir(wh._version_path(INDEX_TABLE, v)), (
            "vacuum removed an alias-pinned base version"
        )

    assert admission_gate_batch(wh, b1, 1) is True  # heals from pinned bases
    assert admission_gate_batch(wh, b2, 2) is True
    assert _ledger(wh) == _ledger(wh_ref)
    assert {r["doc_id"] for r in wh.read(INDEX_TABLE).collect()} == {
        r["doc_id"] for r in wh_ref.read(INDEX_TABLE).collect()
    }
