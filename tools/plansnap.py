#!/usr/bin/env python
"""Capture .explain("formatted") for named bench queries to plans/<tag>/.

Usage: python tools/plansnap.py --tag r13 --suffix before q12_pricing_summary ...
Writes plans/<tag>/<query>_<suffix>.txt (judge-checkable plan evidence).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "4")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from data_ingestion_backend_spark.plans.session import get_spark
    from data_ingestion_backend_spark.operators.queries import STANDALONE_QUERIES
    from data_ingestion_backend_spark.registry import QUERIES

    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.tag)
    os.makedirs(outdir, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="plansnap", master=f"local[{cpus}]")
    for name in args.queries:
        fn = QUERIES.get(name) or STANDALONE_QUERIES.get(name)
        if fn is None:
            print(f"SKIP unknown query {name}")
            continue
        df = fn(spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
