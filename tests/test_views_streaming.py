"""Tests for the API-view layer and the Structured Streaming pipeline."""

from __future__ import annotations

import os

from data_ingestion_backend_spark.models import JobStatus
from data_ingestion_backend_spark.operators.views import (
    contact_lookup,
    issue_counts,
    issues_nested,
    jobs_list,
    staging_view,
)
from data_ingestion_backend_spark.pipeline import ingest_file
from data_ingestion_backend_spark.sources.fixtures import load_table
from data_ingestion_backend_spark.sources.warehouse import Warehouse
from data_ingestion_backend_spark.streaming.pipeline import (
    dedup_events_stream,
    enqueue_file,
    process_queue,
    windowed_event_counts,
)
from tests.conftest import SF_DIR_SMALL

USER = 7


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def _seed(spark, wh, tmp_path):
    messy = _write(
        tmp_path,
        "m.csv",
        "email,first_name,last_name,company\n"
        "ok@x.com,Okay,Olsen,OkCo\n"
        ",Missy,Mo,MoCo\n"
        "dup@x.com,D,One,DupCo\n"
        "dup@x.com,D,Two,DupCo\n",
    )
    return ingest_file(spark, wh, messy, USER)


# --- views ------------------------------------------------------------------

def test_views(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    job_id = _seed(spark, wh, tmp_path)

    jobs = jobs_list(wh, USER).collect()
    assert [j["job_id"] for j in jobs] == [job_id]
    assert jobs_list(wh, USER + 1).count() == 0  # ownership scoping

    nested = issues_nested(wh, USER).collect()
    assert len(nested) == 2  # 1 missing-field + 1 duplicate-email group
    cols = set(nested[0].asDict())
    assert "issue_key" not in cols and "staging_row_hash" not in cols  # P1
    dup = [r for r in nested if r["issue_type"] == "DUPLICATE_EMAIL"][0]
    assert [a["line_no"] for a in dup["affected_rows"]] == [3, 4]
    assert "staging_row_hash" not in dup["affected_rows"][0].asDict()

    counts = issue_counts(wh, USER).collect()[0]
    assert (counts["total"], counts["resolved"], counts["unresolved"]) == (2, 0, 2)

    c = contact_lookup(wh, USER, "  OK@X.com ").collect()
    assert len(c) == 1 and c[0]["email"] == "ok@x.com"

    sv = staging_view(wh, job_id)
    assert "staging_row_hash" not in sv.columns
    assert [r["line_no"] for r in sv.collect()] == [1, 2, 3, 4]


# --- streaming queue --------------------------------------------------------

def test_streaming_queue_exactly_once(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    landing = str(tmp_path / "landing")
    os.makedirs(landing)

    f1 = _write(tmp_path, "a.csv", "email,first_name,last_name,company\na@x.com,A,B,C\n")
    f2 = _write(tmp_path, "b.csv", "email,first_name,last_name,company\nb@x.com,B,C,D\n")
    bad = _write(tmp_path, "bad.csv", "wrong,headers\n1,2\n")

    enqueue_file(landing, f1, USER)
    enqueue_file(landing, f2, USER)
    enqueue_file(landing, bad, USER)
    process_queue(spark, wh, landing)

    jobs = {j["job_filename"]: j for j in wh.read("jobs").collect()}
    assert jobs["a.csv"]["job_status"] == JobStatus.COMPLETED
    assert jobs["b.csv"]["job_status"] == JobStatus.COMPLETED
    assert jobs["bad.csv"]["job_status"] == JobStatus.FAILED
    assert "missing required headers" in jobs["bad.csv"]["job_error"]
    v_after_first = wh.current_version("jobs")

    # drain again with nothing new: checkpoint must prevent reprocessing
    process_queue(spark, wh, landing)
    assert wh.current_version("jobs") == v_after_first

    # a new manifest is picked up; the old ones stay untouched
    f3 = _write(tmp_path, "c.csv", "email,first_name,last_name,company\nc@x.com,C,D,E\n")
    enqueue_file(landing, f3, USER)
    process_queue(spark, wh, landing)
    jobs = {j["job_filename"]: j["job_status"] for j in wh.read("jobs").collect()}
    assert jobs["c.csv"] == JobStatus.COMPLETED and len(jobs) == 4


# --- event-time operators ---------------------------------------------------

def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    events = load_table(spark, SF_DIR_SMALL, "events")
    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in windowed_event_counts(events).collect()
    }

    # stream the same rows from parquet through the identical plan
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("winagg")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM winagg").collect()
    }
    # append mode emits only watermark-closed windows; every emitted window
    # must match the batch result exactly, and nearly all windows close.
    assert streamed, "stream emitted nothing"
    assert len(streamed) >= len(batch) - 2
    for k, v in streamed.items():
        assert batch[k] == v


def test_dedup_stream_one_per_key(spark, tmp_path):
    events = load_table(spark, SF_DIR_SMALL, "events").limit(200)
    src = str(tmp_path / "ev2")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        dedup_events_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT user_id, event_type, COUNT(*) c FROM dedup GROUP BY 1,2").collect()
    assert rows and all(r["c"] == 1 for r in rows)


# --- crash recovery ---------------------------------------------------------

# Stable (non-timestamp) columns per warehouse table: the recovery
# guarantee is about CONTENT equality; created_at/updated_at legitimately
# differ between a crashed-and-replayed run and an uninterrupted one.
_STABLE_COLS = {
    "jobs": ["job_id", "job_user_id", "job_filename", "job_status",
             "job_total_rows", "job_processed_rows", "job_issue_count",
             "job_error"],
    "staging": ["staging_id", "staging_job_id", "line_no", "email",
                "first_name", "last_name", "company", "staging_status",
                "staging_row_hash"],
    "issues": ["issue_id", "issues_job_id", "issue_type"],
    "contacts": ["contact_id", "contacts_user_id", "email", "first_name",
                 "last_name", "company"],
}


def _snapshot(wh):
    out = {}
    for table, cols in _STABLE_COLS.items():
        out[table] = sorted(
            tuple(r[c] for c in cols) for r in wh.read(table).select(cols).collect()
        )
    return out


def _corpus_files(tmp_path, tag):
    return [
        _write(tmp_path, f"{tag}_a.csv",
               "email,first_name,last_name,company\na@x.com,A,B,C\n"),
        _write(tmp_path, f"{tag}_b.csv",
               "email,first_name,last_name,company\n"
               "b@x.com,B,C,D\n,NoMail,Mo,MoCo\n"),
        _write(tmp_path, f"{tag}_c.csv",
               "email,first_name,last_name,company\n"
               "c@x.com,C,D,E\nc@x.com,C2,D2,E2\n"),
    ]


def test_streaming_crash_recovery_mid_batch(spark, tmp_path, monkeypatch):
    """Kill the query AFTER the micro-batch's ingest work but BEFORE its
    checkpoint commit (the worst-case crash window), restart over the same
    checkpoint, and require the ledger + staging + issues + contacts
    snapshots to equal an uninterrupted run byte-for-byte on every stable
    column.  This is the St3 idempotent-replay claim exercised through an
    ACTUAL failed-and-restarted StreamingQuery rather than a second
    enqueue: on restart Structured Streaming re-delivers the whole
    uncommitted batch and ingest idempotency must absorb it.
    """
    from data_ingestion_backend_spark.sources.warehouse import Warehouse as WH

    # uninterrupted reference run
    ref_wh = Warehouse(spark, str(tmp_path / "ref_wh"))
    ref_landing = str(tmp_path / "ref_landing")
    os.makedirs(ref_landing)
    # IDENTICAL file names in both runs (job_id = md5(user|filename)):
    # write the shared corpus once, enqueue into each landing zone.
    files = _corpus_files(tmp_path, "crash")
    for f in files:
        enqueue_file(ref_landing, f, USER)
    process_queue(spark, ref_wh, ref_landing)

    # crashed-then-recovered run over its own landing + checkpoint
    wh = Warehouse(spark, str(tmp_path / "c_wh"))
    landing = str(tmp_path / "c_landing")
    os.makedirs(landing)
    for f in files:
        enqueue_file(landing, f, USER)

    real_vacuum = WH.vacuum

    def _crash_before_commit(self, *args, **kwargs):
        # handle_batch calls vacuum after ingesting every manifest of the
        # batch and before foreachBatch returns — raising here fails the
        # query with all ingest work done and the offset NOT committed.
        raise RuntimeError("injected crash: post-ingest, pre-commit")

    monkeypatch.setattr(WH, "vacuum", _crash_before_commit)
    try:
        process_queue(spark, wh, landing)
        raise AssertionError("injected crash did not propagate")
    except Exception as exc:  # noqa: BLE001 — StreamingQueryException wrapper
        assert "injected crash" in str(exc)
    finally:
        monkeypatch.setattr(WH, "vacuum", real_vacuum)

    # the work happened, the offset didn't commit
    assert wh.read("jobs").count() == 3

    # restart over the same checkpoint: the whole batch replays
    process_queue(spark, wh, landing)

    assert _snapshot(wh) == _snapshot(ref_wh)

    # and a further drain with nothing new changes nothing
    v = wh.current_version("jobs")
    process_queue(spark, wh, landing)
    assert wh.current_version("jobs") == v
