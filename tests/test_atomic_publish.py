"""Cross-table atomic publish: crash-planted goldens.

The reference's upload worker commits jobs+staging+issues+issue_items+
contacts in ONE Postgres transaction (``job_repository.py:202-226``);
the warehouse analogue is stage-all-then-one-manifest-swap
(``sources/warehouse.py::publish``).  These goldens plant a crash at
every inter-table write point and assert a concurrent reader sees
either the FULL old or FULL new cross-table snapshot — never a mix —
and that the re-run converges (St3 idempotency preserved).
"""

from __future__ import annotations

import pytest

from data_ingestion_backend_spark.operators.mutations import delete_job
from data_ingestion_backend_spark.pipeline import ingest_file, reprocess_job
from data_ingestion_backend_spark.sources.warehouse import Warehouse

USER = 7
TABLES5 = ["jobs", "staging", "issues", "issue_items", "contacts"]

CSV_V1 = (
    "email,first_name,last_name,company\n"
    "a@x.com,Ann,Ames,AcmeCo\n"
    "b@x.com,Bob,Bond,AcmeCo\n"
    "bad-email,Cy,Cole,AcmeCo\n"
)
CSV_V2 = (
    "email,first_name,last_name,company\n"
    "a@x.com,Ann,Ames,AcmeCo\n"
    "d@x.com,Dee,Dale,AcmeCo\n"
)


def _csv(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def _state(wh: Warehouse) -> dict:
    """Full cross-table observable state via one pinned snapshot —
    exactly what a concurrent multi-table reader would materialize."""
    snap = wh.snapshot()
    out = {}
    for t in TABLES5:
        df = wh.read(t, version=snap[t])
        key = {
            "jobs": ["job_id", "job_status", "job_issue_count"],
            "staging": ["staging_id", "staging_status"],
            "issues": ["issue_id", "issue_type"],
            "issue_items": ["issue_id", "staging_id"],
            "contacts": ["contact_id", "email"],
        }[t]
        cols = [c for c in key if c in df.columns]
        out[t] = sorted(tuple(r) for r in df.select(*cols).collect())
    return out


class _PlantedCrash(RuntimeError):
    pass


def _crashing_stage(wh: Warehouse, crash_at: int):
    """Wrap wh.stage to raise on the crash_at-th call (1-based)."""
    orig = wh.stage
    calls = {"n": 0}

    def stage(table, df, partition_by=None):
        calls["n"] += 1
        if calls["n"] == crash_at:
            raise _PlantedCrash(f"planted crash at stage call {crash_at} ({table})")
        return orig(table, df, partition_by)

    return stage


def test_ingest_crash_at_every_stage_point_leaves_old_snapshot(spark, tmp_path, monkeypatch):
    """Crash at each of the 5 stage points and just before publish:
    readers keep the FULL old cross-table state; the clean re-run then
    publishes the FULL new state."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ingest_file(spark, wh, _csv(tmp_path, "f1.csv", CSV_V1), USER)
    old = _state(wh)
    assert old["contacts"], "v1 must promote contacts"

    path2 = _csv(tmp_path, "f1b.csv", CSV_V2)
    # 5 stage calls + the publish-point crash (crash_at=6 never fires a
    # stage, so monkeypatch publish instead for that arm)
    for crash_at in range(1, 6):
        monkeypatch.setattr(wh, "stage", _crashing_stage(wh, crash_at))
        with pytest.raises(_PlantedCrash):
            reprocess_job(spark, wh, path2, USER, filename="f1.csv")
        monkeypatch.undo()
        assert _state(wh) == old, f"mixed snapshot visible after crash at stage {crash_at}"

    def no_publish(versions):
        raise _PlantedCrash("planted crash before manifest swap")

    monkeypatch.setattr(wh, "publish", no_publish)
    with pytest.raises(_PlantedCrash):
        reprocess_job(spark, wh, path2, USER, filename="f1.csv")
    monkeypatch.undo()
    assert _state(wh) == old, "mixed snapshot visible after crash before publish"

    # clean re-run converges to the full new state
    reprocess_job(spark, wh, path2, USER, filename="f1.csv")
    new = _state(wh)
    assert new != old
    emails = {r[1] for r in new["contacts"]}
    assert "d@x.com" in emails and "b@x.com" not in emails


def test_ingest_publish_is_single_swap(spark, tmp_path, monkeypatch):
    """The ingest write path must go through exactly ONE publish call
    covering all five tables — the all-or-nothing guarantee is a
    structural property, not an accident of timing."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    published: list[dict] = []
    orig = wh.publish
    monkeypatch.setattr(
        wh, "publish", lambda versions: (published.append(dict(versions)), orig(versions))[1]
    )
    ingest_file(spark, wh, _csv(tmp_path, "f1.csv", CSV_V1), USER)
    assert len(published) == 1
    assert set(published[0]) == set(TABLES5)


def test_cascade_delete_atomic(spark, tmp_path, monkeypatch):
    """M3 cascade delete: crash at each stage point leaves the full
    pre-delete state; the re-run removes everything with no orphans."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    job_id = ingest_file(spark, wh, _csv(tmp_path, "f1.csv", CSV_V1), USER)
    old = _state(wh)

    for crash_at in range(1, 6):
        monkeypatch.setattr(wh, "stage", _crashing_stage(wh, crash_at))
        with pytest.raises(_PlantedCrash):
            delete_job(wh, job_id, USER)
        monkeypatch.undo()
        assert _state(wh) == old, f"mixed snapshot visible after crash at stage {crash_at}"

    delete_job(wh, job_id, USER)
    gone = _state(wh)
    assert all(not gone[t] for t in TABLES5), gone


def test_search_index_append_publishes_postings_and_stats_together(spark, tmp_path, monkeypatch):
    """A reader can never observe postings that include a batch while
    n_docs/sum_dl exclude it: crash between the postings stage and the
    stats stage must leave BOTH tables at their pre-batch versions, and
    re-delivery of the same batch converges to the rebuilt index."""
    from data_ingestion_backend_spark.operators.search import (
        SEARCH_POSTINGS_TABLE,
        SEARCH_STATS_TABLE,
        append_to_search_index,
        build_search_index,
    )

    wh = Warehouse(spark, str(tmp_path / "whix"))
    docs1 = spark.createDataFrame(
        [(1, "red apple pie"), (2, "green apple tart")], "doc_id long, text string"
    )
    build_search_index(wh, docs1)
    snap0 = wh.snapshot()
    v0 = (snap0[SEARCH_POSTINGS_TABLE], snap0[SEARCH_STATS_TABLE])
    stats0 = wh.read(SEARCH_STATS_TABLE).collect()[0]

    docs2 = spark.createDataFrame([(3, "blue plum jam jam")], "doc_id long, text string")
    # crash on the 2nd stage call (stats) — postings v+1 is materialized
    # but unpublished
    monkeypatch.setattr(wh, "stage", _crashing_stage(wh, 2))
    with pytest.raises(_PlantedCrash):
        append_to_search_index(wh, docs2, batch_id=1)
    monkeypatch.undo()
    snap1 = wh.snapshot()
    assert (snap1[SEARCH_POSTINGS_TABLE], snap1[SEARCH_STATS_TABLE]) == v0
    assert wh.read(SEARCH_STATS_TABLE).collect()[0] == stats0

    # re-delivery of the same batch_id converges (txn intent pins bases)
    append_to_search_index(wh, docs2, batch_id=1)
    stats = wh.read(SEARCH_STATS_TABLE).collect()[0]
    assert stats["n_docs"] == 3 and stats["sum_dl"] == 6 + 4
    n_terms = wh.read(SEARCH_POSTINGS_TABLE).count()
    # doc3 has 3 distinct terms (jam repeated); docs1 contribute 6 rows
    assert n_terms == 6 + 3
