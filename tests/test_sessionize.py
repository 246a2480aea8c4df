"""Sessionization: batch/stream equivalence on the events fixture."""

from __future__ import annotations

from data_ingestion_backend_spark.registry import QUERIES
from data_ingestion_backend_spark.sources.fixtures import load_table
from data_ingestion_backend_spark.streaming.pipeline import sessionize_stream
from tests.conftest import SF_DIR_SMALL


def test_stream_sessions_match_batch(spark, tmp_path):
    """Native session_window (stream) and the lag/cumsum batch form must
    produce the same sessions.  session_window's end = last_event + gap,
    so compare on (user, start, n_events)."""
    batch = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in QUERIES["q30_sessionize"](spark, SF_DIR_SMALL).collect()
    }

    events = load_table(spark, SF_DIR_SMALL, "events")
    src = str(tmp_path / "ev")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    assert streamed, "stream emitted nothing"
    # append mode withholds sessions the watermark hasn't closed; every
    # emitted session must match the batch result exactly.
    assert len(streamed) >= len(batch) - 20
    for k, n in streamed.items():
        assert batch[k] == n, k
