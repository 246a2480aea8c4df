"""applyInPandasWithState: state must carry across micro-batches/restarts."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from data_ingestion_backend_spark.sources.fixtures import load_table
from data_ingestion_backend_spark.streaming.stateful import running_user_stats
from tests.conftest import SF_DIR_SMALL


def _drain(spark, src, ck, qname):
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).parquet(src)
    # memory sink can't recover from a checkpoint; foreachBatch can
    emitted: list = []

    def capture(batch_df, _bid):
        emitted.extend(batch_df.collect())

    q = (
        running_user_stats(stream)
        .writeStream.foreachBatch(capture)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", ck)
        .start()
    )
    q.awaitTermination()
    # update mode re-emits per batch: latest (highest n) row per user wins
    best: dict = {}
    for r in emitted:
        cur = best.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            best[r["user_id"]] = (r["n_events"], round(r["total_value"], 4))
    return best


def test_state_carries_across_batches(spark, tmp_path):
    events = load_table(spark, SF_DIR_SMALL, "events").limit(400).cache()
    half1 = events.filter(F.col("event_id") < 200)
    half2 = events.filter(F.col("event_id") >= 200)

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    half1.write.parquet(src)
    first = _drain(spark, src, ck, "stats1")
    assert first, "no output from first drain"

    # second batch arrives; same checkpoint → state resumes
    half2.write.mode("append").parquet(src)
    final = _drain(spark, src, ck, "stats2")

    expect = {
        r["user_id"]: (r["n"], round(r["t"], 4))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert final == expect  # cumulative across both batches, not just batch 2
    shutil.rmtree(ck, ignore_errors=True)
