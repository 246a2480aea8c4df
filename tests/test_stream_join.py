"""Stream-stream join: drained stream must equal the batch twin exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_backend_spark.sources.fixtures import load_table
from data_ingestion_backend_spark.streaming.joins import (
    attribute_purchases_batch,
    attribute_purchases_stream,
)
from tests.conftest import SF_DIR_SMALL

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def test_stream_stream_join_matches_batch(spark, tmp_path):
    events = load_table(spark, SF_DIR_SMALL, "events")
    src = str(tmp_path / "src")
    events.write.parquet(src)

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    s_clicks = stream.filter(F.col("event_type") == "click")
    s_purch = stream.filter(F.col("event_type") == "purchase")

    emitted: list = []

    def capture(batch_df, _bid):
        emitted.extend(batch_df.collect())

    q = (
        attribute_purchases_stream(s_clicks, s_purch)
        .writeStream.foreachBatch(capture)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination()
    got = {(r["purchase_id"], r["click_id"]) for r in emitted}

    b_clicks = events.filter(F.col("event_type") == "click")
    b_purch = events.filter(F.col("event_type") == "purchase")
    want = {
        (r["purchase_id"], r["click_id"])
        for r in attribute_purchases_batch(b_clicks, b_purch).collect()
    }
    assert want, "fixture produced no attributed pairs — vacuous test"
    assert got == want


def test_streaming_doc_ingestion_gate(spark, tmp_path):
    """dedup_docs_stream admits exactly the documents that are new BOTH
    within the stream and against the static corpus index."""
    from data_ingestion_backend_spark.streaming.pipeline import dedup_docs_stream

    corpus = spark.createDataFrame(
        [(i, f"existing doc number {i}") for i in range(5)],
        "doc_id long, text string",
    )
    corpus_hashes = corpus.select(F.md5(F.col("text")).alias("content_hash"))

    # arrivals: 2 copies of corpus doc 1, 2 copies of a new doc, 1 more new doc
    arrivals = [
        (100, "2024-01-01 10:00:00", "existing doc number 1"),
        (101, "2024-01-01 10:01:00", "a brand new document"),
        (102, "2024-01-01 10:02:00", "a brand new document"),
        (103, "2024-01-01 10:03:00", "existing doc number 1"),
        (104, "2024-01-01 10:04:00", "another new one entirely"),
    ]
    src = str(tmp_path / "arrivals")
    spark.createDataFrame(
        arrivals, "doc_id long, ts string, text string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(src)

    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(src)
    emitted: list = []

    q = (
        dedup_docs_stream(stream, corpus_hashes)
        .writeStream.foreachBatch(lambda b, _i: emitted.extend(b.collect()))
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination()

    texts = sorted(r["text"] for r in emitted)
    assert texts == ["a brand new document", "another new one entirely"]
