#!/usr/bin/env python
"""Corpus-maintenance soak: (a) the INCREMENTAL corpus build's per-batch
cost curve as its state grows, (b) the composed admission gate at a
PRE-GROWN corpus — the r10 verdict's two open measurement items.

Arm "build" — N batches of the documents fixture through
``extend_corpus_build``; per-batch wall clock split first-10 vs last-10.
The raw-text work is delta-only by construction; the curve's residual
slope is the integer-state passes (length window, keep window, λ,
budget) plus the snapshot-rewrite term the local parquet warehouse pays
(Delta/Iceberg file appends would not).  ``--verify`` diffs the final
decision table against the monolithic rebuild (bit-equality — the same
check the goldens run at sf0.001, here at the soak scale).

Arm "admission" — the 60-batch admission soak re-run with the admitted
index PRE-GROWN ~100x the batch volume before the first batch: per-batch
gate cost must track the BATCH (the admitted-only-absorption claim), so
the grown run's per-batch mean should sit near the fresh run's, not
~100x above it.  The grown corpus is synthetic-disjoint (tokens prefixed
per copy, embedding coordinates rotated per copy) so batch docs still
ADMIT — the expensive path — rather than short-circuit to rejection.

Prints one JSON line per arm.  Recorded in SCALE.md §5.

Usage: python tools/corpussoak.py [--arm build|admission|both]
       [--batches N] [--copies G]
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
from data_ingestion_backend_spark.sources.fixtures import load_table
from data_ingestion_backend_spark.sources.warehouse import Warehouse

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
VACUUM_EVERY = 5


def _summarize(lat: list[float]) -> dict:
    head = lat[1 : min(11, len(lat))]
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


def _grown_docs(docs, copies: int):
    """``copies`` synthetic-disjoint clones of the documents fixture for
    pre-growing BUILD state: tokens prefixed per copy (disjoint shingles
    and span-grams → no cross near-dups, no gram-df coupling with the
    measured batches), doc_ids offset far above the fixture range, a
    per-copy SOURCE so the grown mass keeps its own length-percentile
    windows.  The global decisions (DSIR λ, budget line) still couple —
    that is the point: the measured batches pay the real
    integer-recompute cost at grown state."""
    parts = []
    for c in range(1, copies + 1):
        parts.append(
            docs.select(
                (F.col("doc_id") + 10_000_000 * c).alias("doc_id"),
                "lang",
                F.concat(F.lit(f"g{c}_"), F.col("source")).alias("source"),
                "n_chars",
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda x: F.concat(F.lit(f"g{c}"), x),
                    ),
                    " ",
                ).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _table_files(wh, tables) -> dict:
    """inode → size for every data file of each table's CURRENT version
    (hard-linked base files keep their inode, so a batch's fresh bytes
    are exactly the inodes that did not exist before it)."""
    out = {}
    for t in tables:
        v = wh.current_version(t)
        m = {}
        if v >= 0:
            for dirpath, _dirs, files in os.walk(wh._version_path(t, v)):
                for f in files:
                    if f.startswith(("_", ".")):
                        continue
                    st = os.stat(os.path.join(dirpath, f))
                    m[st.st_ino] = st.st_size
        out[t] = m
    return out


def soak_build(
    spark,
    n_batches: int,
    verify: bool,
    decompose: bool = False,
    grown_copies: int = 0,
    part_range: int | None = None,
    lazyclock: bool = False,
) -> dict:
    import data_ingestion_backend_spark.operators.corpus_incremental as ci

    if part_range is not None:
        # Size the doc-id range bucket to the soak corpus.  The default
        # (1024) is tuned for production id densities; the 5 000-doc
        # fixture collapses into ~5 buckets under it, so every flip
        # rewrites a fifth of each mutable table and the write-bytes
        # curve measures BUCKET COARSENESS, not the delta mechanism.
        # The knob is the same mechanism at a corpus-appropriate
        # granularity; constant for the lifetime of the warehouse.
        ci.CB_PART_RANGE = part_range
    from data_ingestion_backend_spark.operators.corpus_incremental import (
        _ALL_TABLES,
        corpus_build_monolithic,
        extend_corpus_build,
        read_decisions,
    )

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "lang", "source", "n_chars", "text")
        .localCheckpoint(eager=True)
    )
    n_docs = docs.count()
    per = n_docs // n_batches
    tmp = tempfile.mkdtemp(prefix="corpussoak_")
    wh = Warehouse(spark, os.path.join(tmp, "wh"))
    lat = []
    new_bytes = []
    table_bytes: list[dict] = []
    max_files = []
    stage_runs: list[dict] = []
    gram_read = []   # read-side cost of the log-structured gram-df state
    gram_files = []  # its physical file count (compaction-cycle sawtooth)
    grown_rows = 0
    try:
        first_id = 0
        if grown_copies:
            grown = _grown_docs(docs, grown_copies).localCheckpoint(eager=True)
            grown_rows = grown.count()
            t0 = time.perf_counter()
            assert extend_corpus_build(wh, grown, 0)
            grown_seed_sec = time.perf_counter() - t0
            print(
                json.dumps(
                    {"grown_seed_docs": grown_rows, "sec": round(grown_seed_sec, 1)}
                ),
                file=sys.stderr,
            )
            first_id = 1
        prev_files = _table_files(wh, _ALL_TABLES)
        for i in range(n_batches):
            lo, hi = i * per, (i + 1) * per if i < n_batches - 1 else n_docs
            batch = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            clocks = {} if (decompose or lazyclock) else None
            ci.STAGE_CLOCK = clocks
            ci.STAGE_EAGER[0] = not lazyclock
            t0 = time.perf_counter()
            assert extend_corpus_build(wh, batch, first_id + i)
            lat.append(time.perf_counter() - t0)
            ci.STAGE_CLOCK = None
            ci.STAGE_EAGER[0] = True
            if decompose or lazyclock:
                stage_runs.append(clocks)
            cur_files = _table_files(wh, _ALL_TABLES)
            per_table = {
                t: sum(
                    sz
                    for ino, sz in cur_files[t].items()
                    if ino not in prev_files[t]
                )
                for t in _ALL_TABLES
            }
            new_bytes.append(sum(per_table.values()))
            table_bytes.append(per_table)
            max_files.append(max(len(cur_files[t]) for t in _ALL_TABLES))
            prev_files = cur_files
            # r13 verdict item: READ-side cost of the log-structured
            # tables across compaction cycles — time one full fold of
            # the gram-df delta log (what every consumer pays) and its
            # file count; the curve must stay flat across fold cycles
            t0 = time.perf_counter()
            ci.gram_df_state(wh).count()
            gram_read.append(time.perf_counter() - t0)
            gram_files.append(len(cur_files[ci.CB_GRAM_DF]))
            if i and i % VACUUM_EVERY == 0:
                for t in _ALL_TABLES:
                    wh.vacuum(t)
            print(
                json.dumps(
                    {
                        "batch": i,
                        "sec": round(lat[-1], 3),
                        "new_mb": round(new_bytes[-1] / 1e6, 2),
                        "max_files": max_files[-1],
                    }
                ),
                file=sys.stderr,
            )
        out = _summarize(lat)
        if grown_copies:
            out["grown_state_docs"] = grown_rows
            out["grown_seed_sec"] = round(grown_seed_sec, 1)
        head_b = new_bytes[1 : min(11, len(new_bytes))]
        tail_b = new_bytes[-10:]
        out["new_mb_first10_mean"] = round(sum(head_b) / len(head_b) / 1e6, 2)
        out["new_mb_last10_mean"] = round(sum(tail_b) / len(tail_b) / 1e6, 2)
        out["bytes_growth"] = round(
            (sum(tail_b) / len(tail_b)) / max(sum(head_b) / len(head_b), 1), 2
        )
        out["max_files_any_table"] = max(max_files)
        gr_head = gram_read[1 : min(11, len(gram_read))]
        gr_tail = gram_read[-10:]
        out["gramdf_read_first10_sec"] = round(
            statistics.mean(gr_head), 3
        )
        out["gramdf_read_last10_sec"] = round(statistics.mean(gr_tail), 3)
        out["gramdf_read_growth"] = round(
            statistics.mean(gr_tail) / max(statistics.mean(gr_head), 1e-9), 2
        )
        out["gramdf_files_per_batch"] = gram_files
        out["gramdf_read_per_batch_sec"] = [round(x, 3) for x in gram_read]
        tail_t = table_bytes[-10:]
        out["table_mb_last10_mean"] = {
            t: round(sum(r[t] for r in tail_t) / len(tail_t) / 1e6, 3)
            for t in _ALL_TABLES
        }
        if (decompose or lazyclock) and stage_runs:
            tail = stage_runs[-10:]
            out["stage_mean_last10_sec"] = {
                k: round(sum(r.get(k, 0.0) for r in tail) / len(tail), 3)
                for k in sorted({k for r in tail for k in r})
            }
        out["decision_rows"] = read_decisions(wh).count()
        if verify:
            full = (
                docs if not grown_copies else grown.unionByName(docs)
            )
            got = sorted(
                tuple(r) for r in read_decisions(wh).collect()
            )
            want = sorted(
                tuple(r) for r in corpus_build_monolithic(full).collect()
            )
            out["monolithic_equal"] = got == want
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _grown_corpus(docs_emb, copies: int):
    """``copies`` synthetic-disjoint clones: tokens prefixed per copy
    (disjoint shingles → no near-dup hits against real docs), embedding
    rotated per copy (random 64-dim rotations land far below the 0.95
    cosine gate)."""
    parts = []
    for c in range(1, copies + 1):
        parts.append(
            docs_emb.select(
                (F.col("doc_id") + 10_000_000 * c).alias("doc_id"),
                "lang",
                F.array_join(
                    F.transform(
                        F.split("text", " "), lambda x: F.concat(F.lit(f"c{c}"), x)
                    ),
                    " ",
                ).alias("text"),
                F.concat(
                    F.slice("e", c + 1, 64 - c), F.slice("e", 1, c)
                ).alias("e"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def soak_admission_grown(spark, n_batches: int, copies: int) -> dict:
    from data_ingestion_backend_spark.operators.mlprep import (
        build_dsir_state,
    )
    from data_ingestion_backend_spark.streaming.admission import (
        ADMISSIONS_TABLE,
        admission_gate_batch,
    )
    from data_ingestion_backend_spark.streaming.neardup import (
        BANDS_TABLE,
        INDEX_TABLE,
        PAIRS_TABLE,
        seed_index,
    )
    from data_ingestion_backend_spark.streaming.semgate import (
        seed_semantic_index,
    )

    docs_emb = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "lang", "text")
        .join(
            load_table(spark, SF_DIR, "embeddings").select(
                F.col("vec_id").alias("doc_id"),
                F.col("embedding").cast("array<double>").alias("e"),
            ),
            "doc_id",
        )
        .localCheckpoint(eager=True)
    )
    n_rows = docs_emb.count()
    per = max(1, n_rows // n_batches)

    def run(grown: bool) -> dict:
        tmp = tempfile.mkdtemp(prefix="admsoak_")
        wh = Warehouse(spark, os.path.join(tmp, "wh"))
        try:
            grown_rows = 0
            if grown:
                big = _grown_corpus(docs_emb, copies).localCheckpoint(
                    eager=True
                )
                grown_rows = big.count()
                seed_index(wh, big.select("doc_id", "text"))
                seed_semantic_index(
                    wh, big.select(F.col("doc_id").alias("vec_id"), "e")
                )
                build_dsir_state(
                    wh,
                    big.select("text"),
                    big.filter(F.col("lang") == "en").select("text"),
                )
            lat = []
            for i in range(n_batches):
                lo, hi = i * per, (i + 1) * per
                batch = docs_emb.filter(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                )
                t0 = time.perf_counter()
                admission_gate_batch(wh, batch, i + 1)
                lat.append(time.perf_counter() - t0)
                if i and i % VACUUM_EVERY == 0:
                    for t in (
                        ADMISSIONS_TABLE,
                        PAIRS_TABLE,
                        INDEX_TABLE,
                        BANDS_TABLE,
                    ):
                        wh.vacuum(t)
            out = _summarize(lat)
            out["grown_index_docs"] = grown_rows
            out["admitted"] = wh.read(ADMISSIONS_TABLE).filter("admitted").count()
            out["batch_rows"] = per
            return out
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    fresh = run(grown=False)
    print(json.dumps({"fresh": fresh}), file=sys.stderr)
    grown = run(grown=True)
    ratio = round(
        grown["last10_mean_sec"] / max(fresh["last10_mean_sec"], 1e-9), 2
    )
    return {"fresh": fresh, "grown": grown, "grown_over_fresh": ratio}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=["build", "admission", "both"], default="both")
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--adm-batches", type=int, default=60)
    ap.add_argument("--copies", type=int, default=4)
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--decompose", action="store_true")
    ap.add_argument(
        "--lazyclock",
        action="store_true",
        help="build arm: lap the PRODUCTION (lazy-checkpoint) path at its "
        "real blocking points instead of forcing eager stage boundaries",
    )
    ap.add_argument(
        "--grown-copies",
        type=int,
        default=0,
        help="build arm: pre-grow the 12-table state with N synthetic-"
        "disjoint fixture clones (one giant batch 0) before measuring",
    )
    ap.add_argument(
        "--part-range",
        type=int,
        default=None,
        help="build arm: doc-id range per state-table bucket (default "
        "CB_PART_RANGE=1024; pass a smaller value to match the fixture's "
        "id density)",
    )
    args = ap.parse_args()
    spark = get_spark(app_name="corpussoak", master="local[32]")
    out = {}
    try:
        if args.arm in ("build", "both"):
            out["incremental_build"] = soak_build(
                spark,
                args.batches,
                args.verify,
                args.decompose,
                args.grown_copies,
                args.part_range,
                args.lazyclock,
            )
            print(json.dumps({"incremental_build": out["incremental_build"]}), file=sys.stderr)
        if args.arm in ("admission", "both"):
            out["admission_grown"] = soak_admission_grown(
                spark, args.adm_batches, args.copies
            )
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
