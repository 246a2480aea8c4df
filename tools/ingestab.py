#!/usr/bin/env python
"""Controlled ingest_e2e A/B: reproducible constant with spread + phase
attribution (round-8 verdict item 1).

The round-8 official artifact showed ingest_e2e at 11.74 s from a SINGLE
timed run taken while the sweep's loadavg climbed past 12 — unattributable
against round 7's 7.94 s.  This harness runs the identical ingest in a
quiet session, N timed runs after one warm-up, and decomposes each run
into phases by wrapping the Warehouse methods:

- ``stage``   — the five per-table snapshot materializations (the write
  set; the observe-folded ledger counters ride these actions),
- ``publish`` — the single cross-table manifest swap (two json renames),
- ``read``    — base-snapshot reads (contacts base, old issue links),
- ``rest``    — csv intake + validation plan construction + driver glue.

It also times the PRE-observe-fold counter shape (one extra count()
action per counted table against the staged parquet) to bound what the
observe fold saves, and prints one JSON line for SCALE.md §8.

Usage: python tools/ingestab.py [--runs 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_backend_spark.plans.session import get_spark
from data_ingestion_backend_spark.sources.warehouse import Warehouse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    from tools.ingestbench import BASE_ROWS, gen_csv  # bench's exact input
    from data_ingestion_backend_spark.pipeline import ingest_file

    spark = get_spark(app_name="ingestab", master="local[32]")
    work = tempfile.mkdtemp(prefix="ingestab_")
    csv_path = os.path.join(work, "batch.csv")
    gen_csv(spark, csv_path, BASE_ROWS)
    wh = Warehouse(spark, os.path.join(work, "wh"))

    phase: dict[str, float] = {}

    def timed_method(obj, name):
        orig = getattr(obj, name)

        def wrap(*a, **kw):
            t0 = time.perf_counter()
            try:
                return orig(*a, **kw)
            finally:
                phase[name] = phase.get(name, 0.0) + time.perf_counter() - t0

        setattr(obj, name, wrap)

    timed_method(wh, "stage")
    timed_method(wh, "publish")
    timed_method(wh, "read")

    totals: list[float] = []
    phases: list[dict[str, float]] = []
    n_total = args.runs + 1  # run 0 = warm-up
    for i in range(n_total):
        phase.clear()
        t0 = time.perf_counter()
        ingest_file(spark, wh, csv_path, user_id=1, reprocess=True)
        total = time.perf_counter() - t0
        if i > 0:
            totals.append(total)
            snap = dict(phase)
            snap["rest"] = total - sum(snap.values())
            snap["total"] = total
            phases.append(snap)

    # pre-observe-fold counter shape: what the ledger counters cost when
    # they ran as their OWN aggregation jobs (one count per counted
    # table over the freshly staged snapshots)
    t0 = time.perf_counter()
    wh.read("staging").count()
    wh.read("issues").count()
    counter_jobs_sec = time.perf_counter() - t0

    med = {
        k: round(statistics.median(p[k] for p in phases), 3)
        for k in phases[0]
    }
    print(
        json.dumps(
            {
                "metric": "ingest_e2e_ab",
                "runs": args.runs,
                "rows": BASE_ROWS,
                "total_median_sec": round(statistics.median(totals), 3),
                "total_min": round(min(totals), 3),
                "total_max": round(max(totals), 3),
                "phase_median_sec": med,
                "pre_observe_counter_jobs_sec": round(counter_jobs_sec, 3),
                "loadavg": list(os.getloadavg()),
                "cpus": os.cpu_count(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
