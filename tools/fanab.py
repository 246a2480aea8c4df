#!/usr/bin/env python
"""Targeted A/B: time a list of queries (1 warm + N timed, median) in one
session.  Fan/table config comes from the env (set by the caller); prints
one JSON line per query."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "4")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    runs = int(os.environ.get("FANAB_RUNS", "3"))
    from data_ingestion_backend_spark.plans.session import get_spark
    from data_ingestion_backend_spark.operators.queries import STANDALONE_QUERIES
    from data_ingestion_backend_spark.registry import QUERIES

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="fanab", master=f"local[{cpus}]")
    # settle JIT like bench.py does
    QUERIES["q12_pricing_summary"](spark, sf).collect()
    out = {}
    for name in names:
        fn = QUERIES.get(name) or STANDALONE_QUERIES[name]
        samples = []
        for i in range(runs + 1):
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            if i:
                samples.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(samples), 3)
    print("FANAB " + json.dumps({"cfg": {k: os.environ.get(k) for k in ("SPARK_GRAFT_SMALL_SCAN_FAN", "SPARK_GRAFT_FAN_TABLES")}, "q": out}))
    spark.stop()


if __name__ == "__main__":
    main()
