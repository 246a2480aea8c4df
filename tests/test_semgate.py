"""Streaming semantic admission gate (streaming/semgate.py).

Pairs accumulated across micro-batches must equal the one-shot
composition over the same vectors (every same-cell cosine >= threshold
pair touching a streamed vector, exactly once), and the exactly-once
guards must hold: checkpoint re-drain no-op, re-delivered batch_id
rejected, crash-before-marker healed by the intent's pinned bases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR_ORACLE
from data_ingestion_backend_spark.operators.similarity import (
    _assign_clusters,
    _emb,
    _train_centroids_sample,
)
from data_ingestion_backend_spark.sources.warehouse import Warehouse
from data_ingestion_backend_spark.streaming.semgate import (
    SEM_INDEX_TABLE,
    SEM_PAIRS_TABLE,
    SEM_THRESHOLD,
    last_admitted_batch,
    maintain_semantic_pairs,
    seed_semantic_index,
    semantic_gate_batch,
    semantic_pairs_for_batch,
)

#: planted copies: vec 10000+i is vec i scaled by 2 (cosine exactly 1,
#: same cell — scaling never changes a spherical assignment)
N_PLANTED = 4


def _with_planted(emb):
    copies = (
        emb.filter(F.col("vec_id") < N_PLANTED)
        .select(
            (F.col("vec_id") + 10000).alias("vec_id"),
            F.transform("e", lambda x: x * 2.0).alias("e"),
        )
    )
    return copies


def _split(spark):
    emb = _emb(spark, SF_DIR_ORACLE).select("vec_id", "e")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    new = emb.filter(F.col("vec_id") % 10 == 0).unionByName(_with_planted(emb))
    return corpus, new


def _pairs_unordered(df):
    return {
        (frozenset((r["new_id"], r["old_id"])), r["cosine"]) for r in df.collect()
    }


def _expected(spark, corpus, new):
    """One-shot composition: all same-cell pairs >= threshold touching a
    streamed vector, computed from the pure frame function."""
    C = _train_centroids_sample(corpus)
    corpus_a = _assign_clusters(corpus, "e", C, 1)
    new_a = _assign_clusters(new, "e", C, 1)
    return _pairs_unordered(semantic_pairs_for_batch(new_a, corpus_a))


def test_streamed_pairs_equal_one_shot_composition(spark, tmp_path):
    corpus, new = _split(spark)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    seed_semantic_index(wh, corpus)
    sdir = str(tmp_path / "vec_stream")
    for i in range(3):
        new.where(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(sdir)
    maintain_semantic_pairs(spark, wh, sdir, str(tmp_path / "ckpt"))
    assert last_admitted_batch(wh) >= 2, "expected three micro-batches"

    got = _pairs_unordered(wh.read(SEM_PAIRS_TABLE))
    want = _expected(spark, corpus, new)
    # streamed new x new pairs split across batches still appear exactly
    # once with the same cosine; orientation may differ, hence unordered
    assert got == want
    # the planted copies guarantee the test is non-vacuous
    planted = {frozenset((i, i + 10000)) for i in range(N_PLANTED)}
    assert planted <= {p for p, _ in got}
    assert all(c == 1.0 for p, c in got if p in planted)
    # the index absorbed every arrival exactly once
    assert wh.read(SEM_INDEX_TABLE).count() == corpus.count() + new.count()


def test_redrain_same_checkpoint_is_noop(spark, tmp_path):
    corpus, new = _split(spark)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    seed_semantic_index(wh, corpus)
    sdir = str(tmp_path / "vec_stream")
    new.coalesce(1).write.parquet(sdir)
    ckpt = str(tmp_path / "ckpt")
    maintain_semantic_pairs(spark, wh, sdir, ckpt)
    v_pairs = wh.current_version(SEM_PAIRS_TABLE)
    v_index = wh.current_version(SEM_INDEX_TABLE)
    maintain_semantic_pairs(spark, wh, sdir, ckpt)
    assert wh.current_version(SEM_PAIRS_TABLE) == v_pairs
    assert wh.current_version(SEM_INDEX_TABLE) == v_index


def test_redelivered_batch_rejected(spark, tmp_path):
    corpus, new = _split(spark)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    seed_semantic_index(wh, corpus)
    assert semantic_gate_batch(wh, new, batch_id=0) is True
    pairs_after = _pairs_unordered(wh.read(SEM_PAIRS_TABLE))
    index_after = wh.read(SEM_INDEX_TABLE).count()
    assert semantic_gate_batch(wh, new, batch_id=0) is False
    assert _pairs_unordered(wh.read(SEM_PAIRS_TABLE)) == pairs_after
    assert wh.read(SEM_INDEX_TABLE).count() == index_after


def test_crash_before_marker_heals_from_pinned_bases(spark, tmp_path, monkeypatch):
    from data_ingestion_backend_spark.streaming import txn

    corpus, new = _split(spark)

    wh_ref = Warehouse(spark, str(tmp_path / "wh_ref"))
    seed_semantic_index(wh_ref, corpus)
    assert semantic_gate_batch(wh_ref, new, batch_id=0) is True
    want_pairs = _pairs_unordered(wh_ref.read(SEM_PAIRS_TABLE))
    want_index = wh_ref.read(SEM_INDEX_TABLE).count()

    wh = Warehouse(spark, str(tmp_path / "wh"))
    seed_semantic_index(wh, corpus)

    class Boom(RuntimeError):
        pass

    real_write_atomic = txn.write_atomic

    def crash_on_marker(path, payload):
        if path.endswith("_last_batch"):
            raise Boom("simulated crash before marker write")
        real_write_atomic(path, payload)

    monkeypatch.setattr(txn, "write_atomic", crash_on_marker)
    try:
        semantic_gate_batch(wh, new, batch_id=0)
    except Boom:
        pass
    monkeypatch.setattr(txn, "write_atomic", real_write_atomic)

    assert last_admitted_batch(wh) == -1  # marker missing: hazard live
    assert semantic_gate_batch(wh, new, batch_id=0) is True
    assert _pairs_unordered(wh.read(SEM_PAIRS_TABLE)) == want_pairs
    assert wh.read(SEM_PAIRS_TABLE).count() == len(want_pairs)
    assert wh.read(SEM_INDEX_TABLE).count() == want_index
    assert last_admitted_batch(wh) == 0


def test_unseeded_stream_reads_empty_corpus(spark, tmp_path):
    """No seed: the gate admits everything, emits only new x new pairs —
    and has no quantizer, so it must train one from the batch itself."""
    _, new = _split(spark)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    assert semantic_gate_batch(wh, new, batch_id=0) is True
    got = _pairs_unordered(wh.read(SEM_PAIRS_TABLE))
    new_ids = {r["vec_id"] for r in new.select("vec_id").collect()}
    assert all(set(p) <= new_ids for p, _ in got)
    # at least the planted copies whose originals are ALSO streamed
    both_streamed = {
        frozenset((i, i + 10000)) for i in range(N_PLANTED) if i % 10 == 0
    }
    assert both_streamed <= {p for p, _ in got}
    assert wh.read(SEM_INDEX_TABLE).count() == len(new_ids)
