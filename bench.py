#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

- ``value`` = total wall-clock seconds across the headline queries
  (excluding SparkSession startup and the untimed warm-up pass).
- Each query is executed to completion (``collect`` for small results,
  ``count``-style terminal action otherwise) so the full physical plan runs.

Env knobs: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestion_backend_spark.plans.session import get_spark
from data_ingestion_backend_spark.registry import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

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
    "q34_pivot",
    "q35_percentiles",
    "q36_sliding_range_count",
    "q37_funnel",
    "q39_retention",
    "q40_json_agg",
]


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

    # warm-up (JVM/codegen/file listing) — untimed
    QUERIES["q12_pricing_summary"](spark, SF_DIR).collect()

    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(3):  # best-of-3: absorbs JIT/GC/page-cache noise
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF_DIR)
            # noop sink: executes the complete physical plan (scan→…→sort)
            # without paying Python-side row materialization, so the number
            # measures the engine, not py4j serialization.
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
