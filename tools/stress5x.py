#!/usr/bin/env python
"""5x scale stress harness: wall-clock ratio of heavy operators at 5x data.

Builds a synthetic 5x corpus from $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) — five id-offset copies of `documents` (adversarial
for dedup: every document gains four planted duplicates), `events`
(id+user offset → 5x series), `lineitem` (orderkey offset), and
`embeddings` (vec_id offset) — then times each listed operator at 1x and
5x (noop sink, best-of-2) and prints one JSON line of ratios.

A shape is healthy when its ratio tracks its design: O(n) operators land
~1-5x (fixed overhead hides linearity at the low end), candidate-bounded
dedup grows with collisions, and only the documented exact-quadratic
baseline may exceed that.  Ratios are recorded in SCALE.md §6.

Usage: python tools/stress5x.py [op ...]   (default: the doc-family set)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.queries import STANDALONE_QUERIES
from data_ingestion_backend_spark.plans.session import get_spark
from data_ingestion_backend_spark.registry import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 5
DEFAULT_OPS = [
    "text_doc_stats",
    "text_lang_id",
    "prep_doc_scores",
    "prep_split_sample",
    "prep_pack_sequences",
    "prep_decontaminate",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_sig",
    # round-3/4 operators
    "prep_chunk_docs",
    "prep_domain_cap",
    "emb_quantize_int8",
    "ts_gapfill_hourly",
    "ts_event_gaps",
    "agg_grouping_sets",
    "q33_rollup_cube",
    "media_resize",
    "media_frame_sample",
]

# (table, id columns to offset by i*max+1 per copy) — offsets keep keys
# unique so dedup collisions come only from the planted document copies
MULTIPLIED = {
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey"],
    "embeddings": ["vec_id"],
}


def build_corpus(spark, out_dir: str) -> None:
    for table, id_cols in MULTIPLIED.items():
        df = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
        bounds = df.agg(*[F.max(c).alias(c) for c in id_cols]).collect()[0]
        out = None
        for i in range(COPIES):
            c = df
            for col in id_cols:
                c = c.withColumn(col, F.col(col) + F.lit(i * (bounds[col] + 1)))
            out = c if out is None else out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{table}.parquet"))
    # remaining tables pass through untouched (keeps load_table paths valid)
    for t in "region nation customer supplier part orders".split():
        src = os.path.join(SF_DIR, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def timed(fn, spark, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ops = sys.argv[1:] or DEFAULT_OPS
    spark = get_spark(app_name="stress5x", master="local[32]")
    tmp = tempfile.mkdtemp(prefix="stress5x_", dir=os.path.dirname(__file__))
    try:
        build_corpus(spark, tmp)
        out = {}
        for name in ops:
            fn = QUERIES.get(name) or STANDALONE_QUERIES[name]
            base = timed(fn, spark, SF_DIR)
            big = timed(fn, spark, tmp)
            out[name] = {
                "t1x": round(base, 3),
                "t5x": round(big, 3),
                "ratio": round(big / base, 2),
            }
            print(f"{name:28s} 1x={base:6.2f}s 5x={big:6.2f}s ratio={big/base:5.2f}",
                  file=sys.stderr)
        print(json.dumps({"sf_dir": SF_DIR, "copies": COPIES, "ops": out}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
