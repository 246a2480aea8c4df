#!/usr/bin/env python
"""Ingestion E2E bench: the reference's flagship write path, timed and
stress-tiered.

The reference ingests CSV uploads through sniff → read → validate →
staging/issues/contacts (`src/app/services/csv_validator.py:339-354`)
under a hard 5 MB cap (`csv_validator.py:15`).  This engine exists to
remove that cap — so this bench measures the full pipeline
(``pipeline.ingest_file``: dialect sniff, distributed CSV parse with
line numbering, 4-detector validation, contact promotion, 5 snapshot
writes) at 1× / 10× / 100× the reference's ceiling (~5 MB / ~50 MB /
~500 MB), with the driver-side sniff — the one SERIAL stage — timed
separately so its (bounded, 64 KB head) cost is visible next to the
distributed remainder.

The synthetic file exercises every issue detector: ~1% invalid emails,
~1% missing required fields, ~2% in-file duplicate emails, and ~2%
emails pre-seeded as another job's contacts (EXISTING_EMAIL).

Prints one JSON line per tier + a summary line for SCALE.md §7.

Usage: python tools/ingestbench.py [--tiers 1,10,100]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_ingestion_backend_spark.pipeline import ingest_file
from data_ingestion_backend_spark.plans.session import get_spark
from data_ingestion_backend_spark.sources.intake import sniff_dialect
from data_ingestion_backend_spark.sources.warehouse import Warehouse

#: ~45 bytes/row → 110k rows ≈ the reference's whole 5 MB ceiling
BASE_ROWS = 110_000


def gen_csv(spark, out_path: str, n_rows: int) -> int:
    """Deterministic synthetic contact CSV with planted issue rows."""
    df = spark.range(n_rows).select(
        # ~2% duplicate emails (ids folded onto a shared bucket), ~1%
        # invalid (no @), rest unique-valid
        F.when(F.col("id") % 97 == 0, F.lit("not-an-email"))
        .when(F.col("id") % 50 == 0, F.concat(F.lit("dup"), (F.col("id") % 500).cast("string"), F.lit("@example.com")))
        .otherwise(F.concat(F.lit("user"), F.col("id").cast("string"), F.lit("@example.com")))
        .alias("email"),
        # ~1% missing required field
        F.when(F.col("id") % 89 == 0, F.lit("")).otherwise(
            F.concat(F.lit("First"), (F.col("id") % 1000).cast("string"))
        ).alias("first_name"),
        F.concat(F.lit("Last"), (F.col("id") % 1000).cast("string")).alias("last_name"),
        F.concat(F.lit("Co "), (F.col("id") % 250).cast("string")).alias("company"),
    )
    tmp = out_path + "._dir"
    df.coalesce(1).write.option("header", True).mode("overwrite").csv(tmp)
    [part] = glob.glob(os.path.join(tmp, "part-*.csv"))
    shutil.move(part, out_path)
    shutil.rmtree(tmp, ignore_errors=True)
    return os.path.getsize(out_path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default="1,10,100")
    args = ap.parse_args()
    tiers = [int(t) for t in args.tiers.split(",")]

    spark = get_spark(app_name="ingestbench", master="local[32]")
    work = tempfile.mkdtemp(prefix="ingestbench_")
    results = []
    try:
        # seed file: a prior user's contacts overlapping ~2% of the main
        # file's emails, so EXISTING_EMAIL fires for real
        seed_path = os.path.join(work, "seed.csv")
        seed = spark.range(1000).select(
            F.concat(F.lit("user"), (F.col("id") * 43).cast("string"), F.lit("@example.com")).alias("email"),
            F.lit("Seed").alias("first_name"),
            F.lit("User").alias("last_name"),
            F.lit("SeedCo").alias("company"),
        )
        tmp = seed_path + "._dir"
        seed.coalesce(1).write.option("header", True).mode("overwrite").csv(tmp)
        [p] = glob.glob(os.path.join(tmp, "part-*.csv"))
        shutil.move(p, seed_path)
        shutil.rmtree(tmp, ignore_errors=True)

        for tier in tiers:
            n = BASE_ROWS * tier
            path = os.path.join(work, f"batch_{tier}x.csv")
            nbytes = gen_csv(spark, path, n)

            wh = Warehouse(spark, os.path.join(work, f"wh_{tier}x"))
            ingest_file(spark, wh, seed_path, user_id=1)  # seeds contacts

            t0 = time.perf_counter()
            dialect = sniff_dialect(path)
            t_sniff = time.perf_counter() - t0

            t0 = time.perf_counter()
            job_id = ingest_file(spark, wh, path, user_id=1)
            t_e2e = time.perf_counter() - t0

            n_staging = wh.read("staging").filter(
                F.col("staging_job_id") == job_id
            ).count()
            n_issues = wh.read("issues").filter(
                F.col("issues_job_id") == job_id
            ).count()
            assert n_staging == n, f"staging rows {n_staging} != {n}"
            assert n_issues > 0, "no issues detected — planted rows missing"

            row = {
                "tier": tier,
                "rows": n,
                "mb": round(nbytes / 1e6, 1),
                "sniff_sec": round(t_sniff, 4),
                "e2e_sec": round(t_e2e, 3),
                "rows_per_sec": int(n / t_e2e),
                "issues": n_issues,
                "dialect": f"{dialect.encoding}/{dialect.delimiter!r}",
            }
            results.append(row)
            print(json.dumps(row), flush=True)
        base = results[0]["e2e_sec"]
        print(json.dumps({
            "metric": "ingest_e2e_curve",
            "tiers": {str(r["tier"]): r["e2e_sec"] for r in results},
            "ratios": {str(r["tier"]): round(r["e2e_sec"] / base, 2) for r in results},
            "sniff_frac_at_max": round(
                results[-1]["sniff_sec"] / results[-1]["e2e_sec"], 5
            ),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
