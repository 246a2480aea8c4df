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
