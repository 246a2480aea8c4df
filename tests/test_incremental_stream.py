"""Streaming materialized view (streaming/incremental.py): the merged
state must equal a flat re-aggregation, survive checkpoint re-drains,
and absorb foreachBatch re-delivery without double-counting."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR_SMALL
from data_ingestion_backend_spark.sources.fixtures import load_table
from data_ingestion_backend_spark.sources.warehouse import Warehouse
from data_ingestion_backend_spark.streaming.incremental import (
    aggregate_user_totals,
    apply_delta_batch,
    last_applied_batch,
    maintain_user_totals,
)


def _snap(df):
    return sorted(tuple(r) for r in df.collect())


def _seed_stream_dir(spark, path: str):
    """Three part-files so maxFilesPerTrigger=1 forces three merges."""
    ev = load_table(spark, SF_DIR_SMALL, "events")
    for i in range(3):
        ev.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    return ev


def test_maintained_state_equals_flat_reaggregation(spark, tmp_path):
    sdir = str(tmp_path / "events_stream")
    ev = _seed_stream_dir(spark, sdir)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    maintain_user_totals(spark, wh, sdir, str(tmp_path / "ckpt"))

    # at least two incremental merges actually happened (not one drain)
    assert last_applied_batch(wh, "user_totals") >= 2

    got = _snap(wh.read("user_totals"))
    want = _snap(aggregate_user_totals(ev))
    assert got == want


def test_redrain_same_checkpoint_is_noop(spark, tmp_path):
    sdir = str(tmp_path / "events_stream")
    _seed_stream_dir(spark, sdir)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    maintain_user_totals(spark, wh, sdir, ckpt)
    v1 = wh.current_version("user_totals")
    before = _snap(wh.read("user_totals"))
    maintain_user_totals(spark, wh, sdir, ckpt)  # nothing new to drain
    assert wh.current_version("user_totals") == v1
    assert _snap(wh.read("user_totals")) == before


def test_redelivered_batch_is_rejected_not_double_counted(spark, tmp_path):
    """The crash window: state written, checkpoint not committed, Spark
    re-runs the same batch_id — the marker guard must make the re-run a
    no-op, while a genuinely NEW batch id with the same data merges."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ev = load_table(spark, SF_DIR_SMALL, "events").limit(50)

    assert apply_delta_batch(wh, "user_totals", ev, batch_id=0) is True
    after_first = _snap(wh.read("user_totals"))

    # re-delivery of batch 0 (same id): rejected, state bit-identical
    assert apply_delta_batch(wh, "user_totals", ev, batch_id=0) is False
    assert _snap(wh.read("user_totals")) == after_first

    # a NEW batch with the same rows is real data and must double totals
    assert apply_delta_batch(wh, "user_totals", ev, batch_id=1) is True
    doubled = {r[0]: r[1] for r in _snap(wh.read("user_totals"))}
    singles = {r[0]: r[1] for r in after_first}
    assert doubled == {k: 2 * v for k, v in singles.items()}


def test_resume_across_restarts_with_new_data(spark, tmp_path):
    """Stop-and-restart lifecycle: drain, new files arrive, drain again
    over the SAME checkpoint — the second run must merge only the new
    files (no reprocessing) and the final state must equal the flat
    re-aggregation of everything."""
    sdir = str(tmp_path / "events_stream")
    ckpt = str(tmp_path / "ckpt")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ev = load_table(spark, SF_DIR_SMALL, "events")

    ev.where(F.col("event_id") % 3 == 0).coalesce(1).write.mode("append").parquet(sdir)
    maintain_user_totals(spark, wh, sdir, ckpt)
    b1 = last_applied_batch(wh, "user_totals")

    for i in (1, 2):
        ev.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(sdir)
    maintain_user_totals(spark, wh, sdir, ckpt)

    # restart resumed batch numbering (no replay of batch <= b1)
    assert last_applied_batch(wh, "user_totals") > b1
    assert _snap(wh.read("user_totals")) == _snap(aggregate_user_totals(ev))


def test_crash_between_state_write_and_marker_is_idempotent(
    spark, tmp_path, monkeypatch
):
    """The window the marker cannot cover: the merged state snapshot
    committed, then the process died BEFORE the marker write.  The
    re-delivered batch finds its intent record and re-merges against the
    RECORDED base version — final state equals a single clean run, no
    double-counted sums."""
    from data_ingestion_backend_spark.streaming import txn

    ev = load_table(spark, SF_DIR_SMALL, "events")
    b0 = ev.where(F.col("event_id") % 3 == 0)
    b1 = ev.where(F.col("event_id") % 3 != 0)

    # clean reference
    wh_ref = Warehouse(spark, str(tmp_path / "wh_ref"))
    assert apply_delta_batch(wh_ref, "user_totals", b0, 0) is True
    assert apply_delta_batch(wh_ref, "user_totals", b1, 1) is True
    want = _snap(wh_ref.read("user_totals"))

    # crashed run: batch 1's state write commits, marker write dies
    wh = Warehouse(spark, str(tmp_path / "wh"))
    assert apply_delta_batch(wh, "user_totals", b0, 0) is True

    class Boom(RuntimeError):
        pass

    real_write_atomic = txn.write_atomic

    def crash_on_marker(path, payload):
        if path.endswith("_last_batch"):
            raise Boom("simulated crash before marker write")
        real_write_atomic(path, payload)

    monkeypatch.setattr(txn, "write_atomic", crash_on_marker)
    try:
        apply_delta_batch(wh, "user_totals", b1, 1)
    except Boom:
        pass
    monkeypatch.setattr(txn, "write_atomic", real_write_atomic)

    # hazard is real: state advanced past batch 0's version, marker didn't
    assert wh.current_version("user_totals") == 1
    assert last_applied_batch(wh, "user_totals") == 0

    # re-delivery must REPLACE the partial commit, not merge on top of it
    assert apply_delta_batch(wh, "user_totals", b1, 1) is True
    assert _snap(wh.read("user_totals")) == want
    assert last_applied_batch(wh, "user_totals") == 1
