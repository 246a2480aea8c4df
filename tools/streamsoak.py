#!/usr/bin/env python
"""Long streaming soak: 100+ micro-batches through the stateful sinks.

The 3-batch golden tests prove correctness; this harness proves the
per-batch cost stays BOUNDED as state grows — the property that decides
whether an always-on intake survives its first week.  Two sinks:

- **near-dup gate** (``streaming/neardup.py``): the LSH index grows by
  one batch per batch; per-batch cost must track |batch| + candidate
  pairs (the persisted band table keeps the probe from re-deriving
  O(index) band keys each batch), plus an O(index) snapshot-append term
  the local parquet warehouse pays that Delta/Iceberg file-level appends
  would not.
- **materialized view** (``streaming/incremental.py``): state stays
  |users|-sized regardless of batch count; per-batch cost must be flat.

Every 10 batches the warehouse vacuums to keep=2 versions, modelling the
production retention loop (and bounding soak disk).

Prints one JSON line:
``{"sink": {"n_batches": N, "per_batch_sec": [...], "first10_mean": s,
"last10_mean": s, "growth": last/first, "total_sec": s}, ...}``
Recorded in SCALE.md §5.

Usage: python tools/streamsoak.py [--batches N] (default 100)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_ingestion_backend_spark.plans.session import get_spark
from data_ingestion_backend_spark.sources.fixtures import load_table, normalize_event_time
from data_ingestion_backend_spark.sources.warehouse import Warehouse
from data_ingestion_backend_spark.streaming.incremental import apply_delta_batch
from data_ingestion_backend_spark.streaming.neardup import (
    BANDS_TABLE,
    INDEX_TABLE,
    PAIRS_TABLE,
    neardup_gate_batch,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
VACUUM_EVERY = 10


def _drain(spark, src_dir, schema_df, handler, n_files: int, ckpt: str) -> list[float]:
    """Drive the directory stream one file per micro-batch, timing each
    handler invocation (the real foreachBatch path)."""
    latencies: list[float] = []

    def timed_handle(batch_df, batch_id):
        t0 = time.perf_counter()
        handler(batch_df, batch_id)
        latencies.append(time.perf_counter() - t0)

    stream = (
        spark.readStream.schema(schema_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .foreachBatch(timed_handle)
        .start()
    )
    q.awaitTermination()
    return latencies


def _summarize(lat: list[float]) -> dict:
    head = lat[1:11]  # skip batch 0: carries stream+sink warm-up
    tail = lat[-10:]
    return {
        "n_batches": len(lat),
        "first10_mean_sec": round(statistics.mean(head), 3),
        "last10_mean_sec": round(statistics.mean(tail), 3),
        "growth": round(statistics.mean(tail) / statistics.mean(head), 2),
        "max_sec": round(max(lat), 3),
        "total_sec": round(sum(lat), 1),
        "per_batch_sec": [round(x, 3) for x in lat],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=100)
    args = ap.parse_args()
    n = args.batches
    spark = get_spark(app_name="streamsoak", master="local[32]")
    tmp = tempfile.mkdtemp(prefix="streamsoak_")
    out = {}
    try:
        # ----- near-dup gate over documents ------------------------------
        docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
        docs_dir = os.path.join(tmp, "docs")
        # one write, n files: each micro-batch is a hash slice — content
        # does not matter for the soak, index growth does
        docs.repartition(n).write.parquet(docs_dir)
        wh1 = Warehouse(spark, os.path.join(tmp, "wh_neardup"))

        def nd_handle(batch_df, batch_id):
            neardup_gate_batch(wh1, batch_df, batch_id)
            if batch_id and batch_id % VACUUM_EVERY == 0:
                for t in (PAIRS_TABLE, INDEX_TABLE, BANDS_TABLE):
                    wh1.vacuum(t)

        lat1 = _drain(
            spark, docs_dir, docs, nd_handle, n, os.path.join(tmp, "ck1")
        )
        out["neardup_gate"] = _summarize(lat1)
        out["neardup_gate"]["index_docs"] = wh1.read(INDEX_TABLE).count()
        out["neardup_gate"]["pairs"] = wh1.read(PAIRS_TABLE).count()
        print(json.dumps({"neardup_gate": out["neardup_gate"]}), file=sys.stderr)

        # ----- materialized view over events -----------------------------
        ev = normalize_event_time(load_table(spark, SF_DIR, "events")).select(
            "user_id", "value", "ts"
        )
        ev_dir = os.path.join(tmp, "events")
        ev.repartition(n).write.parquet(ev_dir)
        wh2 = Warehouse(spark, os.path.join(tmp, "wh_mv"))

        def mv_handle(batch_df, batch_id):
            apply_delta_batch(wh2, "user_totals", batch_df, batch_id)
            if batch_id and batch_id % VACUUM_EVERY == 0:
                wh2.vacuum("user_totals")

        lat2 = _drain(spark, ev_dir, ev, mv_handle, n, os.path.join(tmp, "ck2"))
        out["materialized_view"] = _summarize(lat2)
        out["materialized_view"]["state_rows"] = wh2.read("user_totals").count()
        print(json.dumps({"materialized_view": out["materialized_view"]}), file=sys.stderr)

        # ----- semantic admission gate over embeddings --------------------
        from data_ingestion_backend_spark.streaming.semgate import (
            SEM_INDEX_TABLE,
            SEM_PAIRS_TABLE,
            semantic_gate_batch,
        )

        emb = load_table(spark, SF_DIR, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
        emb_dir = os.path.join(tmp, "emb")
        emb.repartition(n).write.parquet(emb_dir)
        wh3 = Warehouse(spark, os.path.join(tmp, "wh_sem"))
        # unseeded on purpose: the first batch trains the frozen quantizer
        # (deterministic), every later batch probes + absorbs — the
        # bounded-growth claim is the same as the near-dup gate's

        def sem_handle(batch_df, batch_id):
            semantic_gate_batch(wh3, batch_df, batch_id)
            if batch_id and batch_id % VACUUM_EVERY == 0:
                for t in (SEM_PAIRS_TABLE, SEM_INDEX_TABLE):
                    wh3.vacuum(t)

        lat3 = _drain(spark, emb_dir, emb, sem_handle, n, os.path.join(tmp, "ck3"))
        out["semantic_gate"] = _summarize(lat3)
        out["semantic_gate"]["index_vecs"] = wh3.read(SEM_INDEX_TABLE).count()
        out["semantic_gate"]["pairs"] = wh3.read(SEM_PAIRS_TABLE).count()
        print(json.dumps({"semantic_gate": out["semantic_gate"]}), file=sys.stderr)

        # ----- composed admission (near-dup + semantic + DSIR, one txn) ----
        from data_ingestion_backend_spark.streaming.admission import (
            ADMISSIONS_TABLE,
            admission_gate_batch,
        )
        from data_ingestion_backend_spark.operators.mlprep import (
            DSIR_STATE_TABLE,
        )

        adm_in = (
            load_table(spark, SF_DIR, "documents")
            .select("doc_id", "lang", "text")
            .join(
                load_table(spark, SF_DIR, "embeddings").select(
                    F.col("vec_id").alias("doc_id"),
                    F.col("embedding").cast("array<double>").alias("e"),
                ),
                "doc_id",
            )
        )
        adm_dir = os.path.join(tmp, "adm")
        adm_in.repartition(n).write.parquet(adm_dir)
        wh4 = Warehouse(spark, os.path.join(tmp, "wh_adm"))

        def adm_handle(batch_df, batch_id):
            admission_gate_batch(wh4, batch_df, batch_id)
            if batch_id and batch_id % VACUUM_EVERY == 0:
                for t in (
                    ADMISSIONS_TABLE,
                    PAIRS_TABLE,
                    INDEX_TABLE,
                    BANDS_TABLE,
                    DSIR_STATE_TABLE,
                ):
                    wh4.vacuum(t)

        lat4 = _drain(
            spark, adm_dir, adm_in, adm_handle, n, os.path.join(tmp, "ck4")
        )
        out["admission_gate"] = _summarize(lat4)
        out["admission_gate"]["admitted"] = (
            wh4.read(ADMISSIONS_TABLE).filter("admitted").count()
        )
        out["admission_gate"]["rejected"] = (
            wh4.read(ADMISSIONS_TABLE).filter("NOT admitted").count()
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
