#!/usr/bin/env python
"""Interleaved fan A/B: for each query, alternate fan-off/fan-on runs in
ONE session (A B A B after a warm run of each), so host drift cannot
masquerade as a fan effect.  Prints per-query medians for both arms."""

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
    reps = int(os.environ.get("FANAB2_REPS", "2"))
    from data_ingestion_backend_spark.plans.session import get_spark
    from data_ingestion_backend_spark.operators.queries import STANDALONE_QUERIES
    from data_ingestion_backend_spark.registry import QUERIES
    from data_ingestion_backend_spark.sources import fixtures
    from data_ingestion_backend_spark.operators import dedup

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="fanab2", master=f"local[{cpus}]")
    QUERIES["q12_pricing_summary"](spark, sf).collect()  # JIT settle

    def set_fan(v: int) -> None:
        fixtures._FAN_MAX = v
        fixtures._FAN_MEMO.clear()
        # session memos may have been built under the other arm
        for _fp, df in list(dedup._PERSIST_MEMO.values()):
            try:
                df.unpersist()
            except Exception:
                pass
        dedup._PERSIST_MEMO.clear()

    out = {}
    for name in names:
        fn = QUERIES.get(name) or STANDALONE_QUERIES[name]
        samples = {0: [], 64: []}
        for arm in (0, 64):  # warm each arm once
            set_fan(arm)
            fn(spark, sf).write.format("noop").mode("overwrite").save()
        for _ in range(reps):
            for arm in (0, 64):
                set_fan(arm)
                t0 = time.perf_counter()
                fn(spark, sf).write.format("noop").mode("overwrite").save()
                samples[arm].append(time.perf_counter() - t0)
        out[name] = {
            "fan0": round(statistics.median(samples[0]), 3),
            "fan64": round(statistics.median(samples[64]), 3),
            "ratio": round(statistics.median(samples[64]) / statistics.median(samples[0]), 3),
        }
        print("PAIR", name, json.dumps(out[name]), flush=True)
    print("FANAB2 " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
