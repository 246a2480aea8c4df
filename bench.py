#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints the full detail JSON line
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "spread": {...}, "runs_per_query": 5, "loadavg": {...}}``
followed by a compact (<300 byte) headline summary as the LAST stdout
line, and writes the full detail to ``BENCH_LOCAL.json``.  Round 5's
single ~6 KB line outgrew the driver's stdout tail-capture
(BENCH_r05.json recorded ``parsed: null``); the trailing compact line
guarantees the headline number survives any capture window.

- ``value`` = total wall-clock seconds across the headline queries
  (excluding SparkSession startup and the untimed warm-up pass).
- Each per-query number is the MEDIAN of ``RUNS`` timed executions after
  ONE untimed warm run of that query (codegen/JIT/file listing settle —
  without it the first timed query of the sweep absorbs the whole
  session's JIT warm-up and reads ~2x its steady state), with the
  min/max spread recorded per query under ``spread`` — a regression is
  only believable when the medians' spread windows don't overlap.
- ``loadavg`` records the host 1/5/15-min load before and after the
  sweep: on a shared sandbox, elevated load explains broad drift that
  would otherwise read as a code regression.
- Each query is executed to completion via the noop sink so the full
  physical plan runs.

Env knobs: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# Pin BLAS threading BEFORE numpy's first import (r11): the calibration
# matmul and the Arrow-GEMM worker stages otherwise inherit whatever the
# invoking shell set — unpinned, OpenBLAS grabs all 32 cores, so the
# "fixed-work CPU reference" measures the SHELL (0.39 s unpinned vs
# 1.01 s at 4 threads on the same boot) and 32 Python workers × 32 BLAS
# threads oversubscribe the GEMM stages.  4 threads reproduces the
# historical reference-host calibration band (~1.0-1.4 s), making the
# artifact comparable across sessions regardless of caller environment.
# setdefault keeps an explicit caller override possible.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "4")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestion_backend_spark.plans.session import get_spark
from data_ingestion_backend_spark.operators.queries import STANDALONE_QUERIES
from data_ingestion_backend_spark.registry import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))

# Headline set: the shapes that dominate real workloads — big decimal agg,
# shuffling joins, windows, event dedup, distinct-agg, json, plus the
# extension operators once registered (they self-select by prefix).
HEADLINE = [
    "q12_pricing_summary",
    "q08_multiway_join",
    "q09_left_join_count",
    "q10_semi_anti_join",
    "q16_month_rollup",
    "q18_pergroup_topk",
    "q19_running_total",
    "q22_tumbling_window",
    "q25_distinct_agg",
    "q28_shipping_priority",
    "q29_regional_revenue",
    "q30_sessionize",
    "q31_asof_join",
    "q32_range_join",
    "q33_rollup_cube",
    "q35_percentiles",
    "q36_sliding_range_count",
    "q37_funnel",
    "q39_retention",
    "q40_json_agg",
    # round-11: the two composed capstones, now driver-graded (rotated
    # from STANDALONE_HEADLINE — same entries, same workload)
    "prep_corpus_e2e",
    "prep_corpus_datasheet",
]

STANDALONE_HEADLINE = [
    "cdc_snapshot_diff",
    "scd2_user_history",
    "sketch_cm_heavy_hitters",
    "layout_zorder_stats",
    "layout_compaction_plan",
    "agg_incremental_merge",
    "text_clean",
    "dq_star_expectations",
    "search_bm25_topk",
    "search_hybrid_rrf",
    "ts_anomaly_zscore",
    "ts_anomaly_mad",
    "dedup_incremental",
    "text_vocab_topn",
    "scale_bloom_pruned_join",
    # round-6: correlated + global scalar subqueries via the SQL text surface
    "q41_correlated_avg_qty",
    "q42_min_per_group_joinback",
    "q43_nested_semi_agg",
    "q44_global_fraction_having",
    "q45_max_over_view",
    "q46_antijoin_above_avg",
    "graph_pagerank",
    "q47_null_semantics",
    "q48_unpivot",
    "q49_moving_frame",
    "ts_ewma",
    "ts_concurrency",
    "fuzzy_part_names",
    "q50_profit_star_join",
    "prep_sample_exact_k",
    "q51_lateral_topk",
    # round-7: salted-join mechanism cert + BPE merge learning +
    # recursive-CTE cert (identical text on both engines)
    "scale_salted_join_segments",
    "text_bpe_merges",
    "q52_recursive_ancestors",
    # round-8: the at-scale PageRank arm gets its own regression row
    "graph_pagerank_bucketed",
    # round-8: exact substring span dedup (Lee et al. ACL'22, postings form)
    "dedup_substring_spans",
    # round-8: full-corpus distributed Lloyd (5 GEMM+combine iterations)
    "sim_kmeans_train",
    # round-8: deterministic sharded epoch shuffle
    "prep_epoch_shuffle",
    # round-8: BPE corpus encoding (vocabulary-encode + join-back)
    "text_bpe_encode",
    # round-8: distributed PCA (mergeable Gram partials + GEMM projection)
    "emb_gram_matrix",
    "emb_pca_project",
    # round-8: span-level remediation (cut repeated spans, keep the docs)
    "dedup_substring_cut",
    # round-8: span-level train/test decontamination
    "prep_decontaminate_spans",
    # round-8: bigram-LM surprisal quality scoring (CCNet-style, integer-exact)
    "text_lm_surprisal",
    # round-8: fuzzy (MinHash) train-vs-held-out decontamination
    "prep_decontaminate_fuzzy",
    # round-8: per-source n-gram diversity profile (integer-ppm terminal)
    "text_ngram_diversity",
    # round-8: temperature-scaled source mixing (T=0.5, exact isqrt weights)
    "prep_mix_temperature",
    # round-8: product quantization ANN (ADC shortlist + exact re-rank)
    "sim_pq_topk",
    # round-8: DPR-style BM25 hard-negative mining
    "search_hard_negatives",
    # round-8: degree-oriented exact triangle counting
    "graph_triangles",
    # round-8: per-document TF-IDF keyword extraction (integer-exact)
    "text_tfidf_keywords",
    # round-9: DSIR importance weights toward the English slice
    "prep_dsir_weights",
    # round-9: quality-aware canonical keep per near-dup cluster
    "dedup_canonical_quality",
    # round-9: composed IVFADC (coarse cells + residual PQ ADC)
    "sim_ivfadc_topk",
    # round-9: retrieval evaluation (integer-exact nDCG@10 / MRR)
    "search_eval_ndcg",
    # round-9: greedy token-budget corpus cut (histogram-decomposed prefix)
    "prep_token_budget_select",
    # round-9: cluster-keyed split (near-dups never straddle train/test)
    "prep_split_leakage_free",
    # round-11: q34 rotated out of the graded window (capstones rotated in)
    "q34_pivot",
    # round-11: search-only ANN entries — sim_pq_topk / sim_ivfadc_topk
    # time FULL double-training (honest for a one-shot build, ~5x the
    # per-query cost a user pays); these time the persisted-index search
    # path only (the bench warm-up run pays the one-off build)
    "sim_pq_search",
    "sim_ivfadc_search",
]


def _calibration_sec() -> float:
    """Fixed-work CPU reference: median of 3 seeded 5000² float64
    matmuls (~0.25 TFLOP each, ≥1 s on this host class).  Absolute
    per-query seconds are only comparable across sessions/boots after
    normalizing by this — two end-of-round-5 sweeps reproduced each
    other within 0.5% while sitting ~25% above the mid-round sweep with
    identical plans, i.e. the host itself (microVM scheduling/
    frequency) moves between boots by more than any plan regression we
    chase.  Dividing totals by (calibration / its historical baseline)
    removes that axis.  Round 5's 1500² spin (~50 ms) was itself inside
    scheduler-quantum noise; ≥1 s of fixed work amortizes that.
    """
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.standard_normal((5000, 5000))
    b = rng.standard_normal((5000, 5000))
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        (a @ b).sum()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 4)


def _parallel_calibration_sec() -> float:
    """Fixed-work PARALLEL CPU reference (r12): 32 processes each
    burning a fixed integer loop, wall-clock of the slowest.  The
    4-thread matmul above cannot see the failure mode that invalidated
    the first r12 sweep — the hypervisor throttling the VM to a few
    EFFECTIVE cores while low-parallelism work (and therefore the
    matmul calibration) stays fast: that session measured 0.21 s
    single-proc vs 2.76 s for 32 procs (≈2.4 effective cores of 32)
    with loadavg 0.3 and calibration_sec a healthy 1.06.  Spark's
    32-slot stages live or die on this axis, so the artifact records
    both references; compare sweeps only when BOTH are in band
    (parallel reference ≈0.4-0.7 s on a healthy 32-core host)."""
    import multiprocessing as mp

    samples = []
    ctx = mp.get_context("fork")
    for _ in range(3):
        t0 = time.perf_counter()
        with ctx.Pool(32) as p:
            p.map(_cal_burn, range(32))
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 4)


def _cal_burn(_):
    s = 0
    for i in range(3_000_000):
        s += i * i
    return s


def _sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    names = [n for n in dict.fromkeys(HEADLINE) if n in QUERIES]
    # add extension headliners when present
    names += [
        n
        for n in QUERIES
        if n.split("_")[0]
        in {"dedup", "sim", "text", "sketch", "prep", "ts", "emb", "agg", "scale", "media"}
        and n not in names
    ]
    # round-5 standalone extensions (CDC / SCD2 / CM sketch / layout):
    # benched from the standalone registry so BENCH_r05+ records them;
    # they add ~5 entries to the headline total vs earlier rounds.
    names += [n for n in STANDALONE_HEADLINE if n in STANDALONE_QUERIES]

    # warm-up (JVM/codegen/file listing) — untimed
    QUERIES["q12_pricing_summary"](spark, SF_DIR).collect()

    # ingestion E2E: the reference's flagship write path (sniff → read →
    # validate → promote through 5 snapshot writes) on a ~5 MB synthetic
    # batch — exactly the reference's file-size ceiling
    # (csv_validator.py:15), so the per-round number tracks the pipeline
    # this engine exists to scale past that cap.  Repeat runs take the
    # reprocess path (same job id), which is the same DAG plus the
    # replace-per-job anti-joins — the steady-state ingestion shape.
    import shutil
    import tempfile

    from data_ingestion_backend_spark.pipeline import ingest_file
    from data_ingestion_backend_spark.sources.warehouse import Warehouse
    from tools.ingestbench import BASE_ROWS, gen_csv

    ingest_work = tempfile.mkdtemp(prefix="bench_ingest_")
    ingest_csv = os.path.join(ingest_work, "batch.csv")
    gen_csv(spark, ingest_csv, BASE_ROWS)
    ingest_wh = Warehouse(spark, os.path.join(ingest_work, "wh"))

    def _ingest_e2e(spark_, _sf_dir):
        ingest_file(spark_, ingest_wh, ingest_csv, user_id=1, reprocess=True)
        return spark_.range(0)

    # bench-honesty annotation (r14): some entries share session-persisted
    # intermediates (dedup._session_persisted — shingle/minhash/simhash/
    # bigram tables built once per session).  Their steady-state medians
    # partially measure a MEMORY_AND_DISK cache hit, not the operator; the
    # artifact names them so a reviewer can weigh the absolute numbers.
    from data_ingestion_backend_spark.operators.dedup import _MEMO_EVENTS

    load_start = os.getloadavg()
    timings: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    session_reuse: dict[str, list[str]] = {}
    names.append("ingest_e2e")
    for name in names:
        samples: list[float] = []
        memo_mark = len(_MEMO_EVENTS)
        # ingest_e2e runs ~10 s dominated by fixed control-plane cost
        # (snapshot/ledger jobs).  3 timed runs, not the full RUNS: a
        # single-run entry proved unattributable in round 8 (its 1.48×
        # "regression" was one sample under a loadavg-12 sweep — the
        # controlled A/B in SCALE.md §8 shows the steady constant), and
        # 5 runs would stretch the sweep by ~a minute for a
        # control-plane number.
        n_runs = 3 if name == "ingest_e2e" else RUNS
        for i in range(n_runs + 1):
            t0 = time.perf_counter()
            if name == "ingest_e2e":
                df = _ingest_e2e(spark, SF_DIR)
            else:
                df = (QUERIES.get(name) or STANDALONE_QUERIES[name])(spark, SF_DIR)
            # noop sink: executes the complete physical plan (scan→…→sort)
            # without paying Python-side row materialization, so the number
            # measures the engine, not py4j serialization.
            df.write.format("noop").mode("overwrite").save()
            if i > 0:  # run 0 is the per-query untimed warm-up
                samples.append(time.perf_counter() - t0)
        # Median, not best-of: best-of hides real regressions behind one
        # lucky run and can't distinguish noise from drift.  The min/max
        # window is the evidence a reviewer needs to attribute a delta.
        timings[name] = round(statistics.median(samples), 4)
        spread[name] = {
            "min": round(min(samples), 4),
            "max": round(max(samples), 4),
        }
        hits = sorted(
            {n for n, kind in _MEMO_EVENTS[memo_mark:] if kind == "hit"}
        )
        if hits:
            session_reuse[name] = hits
    load_end = os.getloadavg()
    shutil.rmtree(ingest_work, ignore_errors=True)

    calibration = _calibration_sec()
    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        "runs_per_query": RUNS,
        "spread": spread,
        "loadavg": {
            "start": [round(x, 2) for x in load_start],
            "end": [round(x, 2) for x in load_end],
        },
        # fixed-work CPU reference for cross-boot normalization (see
        # _calibration_sec); ~1.1 s on the round-6 reference host
        "calibration_sec": calibration,
        # fixed-work PARALLEL reference (r12): effective-core capacity;
        # ~0.4-0.7 s healthy, multiples of that = hypervisor throttling
        # the parallel axis the matmul calibration cannot see
        "calibration_parallel_sec": _parallel_calibration_sec(),
        # entries whose timed runs reused session-persisted intermediates
        # (dedup._session_persisted): their absolute medians partially
        # measure a cache hit the warm-up paid for — identical treatment
        # every round, so round-over-round ratios stay fair, but the
        # per-entry numbers flatter the operator (r14 honesty annotation)
        "session_reuse": session_reuse,
    }
    # Full detail (queries + spread + loadavg) to a file: the full JSON
    # line outgrew the driver's stdout tail-capture in round 5
    # (BENCH_r05.json parsed:null), so the durable copy lives on disk.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"), "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass  # read-only checkout: stdout lines below still carry everything
    print(json.dumps(out))
    # Per-query medians in SHORT chunk lines between the detail line and
    # the headline (r14): the driver's stdout tail-capture keeps only the
    # last ~2000 bytes (measured from BENCH_r12/r13 artifacts), so the
    # single ~6 KB detail line above never reaches its per-query diff.
    # Each chunk is a self-describing compact JSON line well under the
    # window; queries are ordered ASCENDING by median so the most
    # expensive entries sit in the LAST chunks — the ones any tail
    # window is guaranteed to keep.  A parser that merges the "queries"
    # dicts of every parseable stdout JSON line reconstructs the full
    # per-query map; a 2000-byte tail still gets the top-cost half.
    ordered = sorted(timings.items(), key=lambda kv: (kv[1], kv[0]))
    chunk_size = 18
    chunks = [
        ordered[i : i + chunk_size] for i in range(0, len(ordered), chunk_size)
    ]
    for i, chunk in enumerate(chunks):
        print(
            json.dumps(
                {
                    "metric": "bench_queries_chunk",
                    "part": i + 1,
                    "of": len(chunks),
                    "sf": out["sf"],
                    "queries": dict(chunk),
                },
                separators=(",", ":"),
            )
        )
    # Compact headline as the LAST stdout line (<300 bytes): any
    # tail-capture window keeps it, so the round's headline number is
    # always machine-readable even when the per-query detail line is not.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": out["value"],
                "unit": "sec",
                "sf": out["sf"],
                "n_queries": len(timings),
                "runs_per_query": RUNS,
                "calibration_sec": calibration,
                "detail": "BENCH_LOCAL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
