#!/usr/bin/env python
"""N-x scale stress harness: wall-clock ratio of heavy operators at N-x data.

Builds a synthetic N-x corpus from $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) — N id-offset copies of `documents` (adversarial
for dedup: every document gains N-1 planted duplicates), `events`
(id+user offset → N-x series), `orders`+`lineitem` (SHARED orderkey
offset so the fact⋈fact join fans out with the data), and `embeddings`
(vec_id offset) — then times each listed operator at 1x and Nx
(noop sink, best-of-2) and prints one JSON line of ratios.

A shape is healthy when its ratio tracks its design: O(n) operators land
~1-Nx (fixed overhead hides linearity at the low end), candidate-bounded
dedup grows with collisions (the planted-duplicate corpus is adversarial:
at Nx every doc sits in an N-clique of exact copies, so pair output grows
O(N²) BY CONSTRUCTION — the candidate generation itself stays
posting/bucket-bounded), and only the documented exact-quadratic baseline
may exceed that.  Ratios are recorded in SCALE.md §6/§7.

Usage: python tools/stress5x.py [--copies N] [op ...]
       (default: 5 copies, the doc-family set)
"""

from __future__ import annotations

import argparse
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
    # round-5 maintenance / sketch / layout family
    "cdc_snapshot_diff",
    "scd2_user_history",
    "sketch_cm_heavy_hitters",
    "layout_zorder_stats",
    "layout_compaction_plan",
    "agg_incremental_merge",
    "text_clean",
    "dq_star_expectations",
    # late round-5: retrieval + anomaly + bloom-pruned join
    "search_bm25_topk",
    "search_hybrid_rrf",
    "ts_anomaly_zscore",
    "ts_anomaly_mad",
    "dedup_incremental",
    "text_vocab_topn",
    "scale_bloom_pruned_join",
    # round-7 operators (round-8 sweep): prefix-filtered Jaccard join on
    # the planted-duplicate documents (adversarial: output is quadratic
    # by construction, candidate generation must stay df_prefix-bounded),
    # and the composed ER DAG on the token-tagged part corpus (linear)
    "dedup_jaccard_prefix",
    "er_canonical_parts",
]

# (table, id columns to offset per copy) — offsets keep keys unique so
# dedup collisions come only from the planted document copies.  orders and
# lineitem share ONE offset base (max o_orderkey + 1) so l_orderkey keeps
# matching o_orderkey inside every copy and the q28/q29 join output scales
# with the corpus instead of silently joining to nothing.
MULTIPLIED = {
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "embeddings": ["vec_id"],
    # part: each copy gets a 3-char tag appended to EVERY p_name token, so
    # the distinct-name corpus and its token vocabulary both grow ~N×
    # (like a real name corpus) while cross-copy names stay ≥3 edits
    # apart (5 tokens × ≥1 differing char each) — the fuzzy/ER family
    # scales linearly instead of degenerating into cross-copy cliques
    "part": ["p_partkey"],
}
_SHARED_OFFSET = {"l_orderkey": ("orders", "o_orderkey"), "o_orderkey": ("orders", "o_orderkey")}


def build_corpus(spark, out_dir: str, copies: int, tag_documents: bool = False) -> None:
    shared: dict[tuple[str, str], int] = {}
    for table, col in set(_SHARED_OFFSET.values()):
        df = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
        shared[(table, col)] = df.agg(F.max(col)).collect()[0][0] + 1
    for table, id_cols in MULTIPLIED.items():
        df = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
        bounds = df.agg(*[F.max(c).alias(c) for c in id_cols]).collect()[0]
        out = None
        for i in range(copies):
            c = df
            for col in id_cols:
                base = (
                    shared[_SHARED_OFFSET[col]]
                    if col in _SHARED_OFFSET
                    else bounds[col] + 1
                )
                c = c.withColumn(col, F.col(col) + F.lit(i * base))
            if table == "part" or (table == "documents" and tag_documents):
                # per-copy token tag: vocabulary grows with the corpus
                # (the realistic near-dup scale shape — cross-copy texts
                # share no tokens, so similarity work scales linearly);
                # without it every doc gains N-1 planted EXACT duplicates
                # and pair output is quadratic by construction
                tag = f"{chr(97 + i // 26)}{chr(97 + i % 26)}q"
                col_name = "p_name" if table == "part" else "text"
                c = c.withColumn(
                    col_name,
                    F.concat(
                        F.regexp_replace(col_name, " ", tag + " "), F.lit(tag)
                    ),
                )
            out = c if out is None else out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{table}.parquet"))
    # remaining tables pass through untouched (keeps load_table paths valid)
    for t in "region nation customer supplier part".split():
        src = os.path.join(SF_DIR, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def _spill_totals(spark) -> tuple[int, int]:
    """(memoryBytesSpilled, diskBytesSpilled) summed over all completed
    stages, via the local UI REST API — the spill/no-spill evidence the
    scale tiers record (SCALE.md §7)."""
    import json as _json
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    if not base:
        return -1, -1
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            stages = _json.load(r)
        return (
            sum(s.get("memoryBytesSpilled", 0) for s in stages),
            sum(s.get("diskBytesSpilled", 0) for s in stages),
        )
    except Exception:
        return -1, -1


def timed(fn, spark, sf_dir: str, spills: dict | None = None) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    if spills is not None:
        mem, disk = _spill_totals(spark)
        spills["mem_spill_total"] = mem
        spills["disk_spill_total"] = disk
    return best


def _persisted_bm25(spark, corpus_dir: str):
    """Special op: build the persisted BM25 index over the corpus ONCE
    (untimed — that's the amortized nightly cost), return a probe
    callable shaped like a registry query so the timed part measures
    the index-backed search only."""
    import tempfile as _tf

    from data_ingestion_backend_spark.operators.search import (
        QUERY_PREFIX_TOKENS,
        bm25_topk_persisted,
        build_search_index,
    )
    from data_ingestion_backend_spark.sources.fixtures import load_table
    from data_ingestion_backend_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, _tf.mkdtemp(prefix="bm25idx_", dir=os.path.dirname(__file__)))
    docs = load_table(spark, corpus_dir, "documents").select("doc_id", "text")
    build_search_index(wh, docs)

    def probe(spark_, sf_dir_):
        d = load_table(spark_, sf_dir_, "documents")
        queries = (
            d.filter((F.col("doc_id") % 100 == 3) & (F.col("doc_id") < 500))
            .select(
                F.col("doc_id").alias("query_id"),
                F.explode(
                    F.slice(F.split(F.col("text"), " "), 1, QUERY_PREFIX_TOKENS)
                ).alias("term"),
            )
            .distinct()
        )
        return bm25_topk_persisted(wh, queries)

    return probe, wh.root


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=5)
    ap.add_argument(
        "--tag-documents",
        action="store_true",
        help="token-tag each documents copy (disjoint vocab per copy → "
        "linear similarity scaling instead of planted-duplicate cliques)",
    )
    ap.add_argument("ops", nargs="*", default=DEFAULT_OPS)
    args = ap.parse_args()
    ops = args.ops or DEFAULT_OPS
    spark = get_spark(app_name=f"stress{args.copies}x", master="local[32]")
    tmp = tempfile.mkdtemp(prefix=f"stress{args.copies}x_", dir=os.path.dirname(__file__))
    try:
        build_corpus(spark, tmp, args.copies, tag_documents=args.tag_documents)
        out = {}
        for name in ops:
            cleanup = None
            if name == "search_bm25_topk_persisted":
                fn_base, idx1 = _persisted_bm25(spark, SF_DIR)
                fn_big, idxN = _persisted_bm25(spark, tmp)
                base = timed(fn_base, spark, SF_DIR)
                sp_before = _spill_totals(spark)
                big = timed(fn_big, spark, tmp)
                sp_after = _spill_totals(spark)
                cleanup = (idx1, idxN)
            else:
                fn = QUERIES.get(name) or STANDALONE_QUERIES[name]
                base = timed(fn, spark, SF_DIR)
                sp_before = _spill_totals(spark)
                big = timed(fn, spark, tmp)
                sp_after = _spill_totals(spark)
            spill_mem = (
                sp_after[0] - sp_before[0] if sp_before[0] >= 0 else -1
            )
            spill_disk = (
                sp_after[1] - sp_before[1] if sp_before[1] >= 0 else -1
            )
            out[name] = {
                "t1x": round(base, 3),
                f"t{args.copies}x": round(big, 3),
                "ratio": round(big / base, 2),
                "spill_mem_bytes": spill_mem,
                "spill_disk_bytes": spill_disk,
            }
            if cleanup:
                for p in cleanup:
                    shutil.rmtree(p, ignore_errors=True)
            print(
                f"{name:28s} 1x={base:6.2f}s {args.copies}x={big:6.2f}s "
                f"ratio={big/base:5.2f}",
                file=sys.stderr,
            )
        print(
            json.dumps(
                {
                    "sf_dir": SF_DIR,
                    "copies": args.copies,
                    "tag_documents": args.tag_documents,
                    "ops": out,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
