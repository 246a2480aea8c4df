#!/usr/bin/env python
"""Triangle edge-build A/B at Nx (the round-9 verdict's one probe).

The triangle pipeline's remaining ~21 GB/run spill at 100x is the edge
BUILD — `.distinct()` hash-aggregates over the 60 M-row lineitem scan,
then a self-join by orderkey, then a second distinct over the generated
pairs.  Hypothesis (verdict #8): the dedup can ride ONE orderkey
shuffle — group parts per order (map-side-combined collect_set does the
(o, p) dedup for free), generate each order's sorted pairs map-side,
and pay only the final (u, v) distinct.

  A (current): distinct(o, p) -> self-join by o (p<p') -> distinct(u, v)
      exchanges: (o,p)-hash, o-hash (x2 arms), (u,v)-hash
  B (probe):   groupBy(o).collect_set(p) -> explode sorted pairs -> distinct(u, v)
      exchanges: o-hash (partials shrink map-side), (u,v)-hash

Times the edge build alone AND the full per-node triangle count on each
variant (noop sink, best-of-2 after an untimed warm), with per-run
spill deltas from the UI REST API.  Result recorded in SCALE.md either
way (the round-5 salted-agg negative-result precedent).

Usage: python tools/triab.py [--copies 100]
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

from data_ingestion_backend_spark.operators.graph import triangle_counts
from data_ingestion_backend_spark.plans.session import get_spark
from tools.stress5x import SF_DIR, _spill_totals, build_corpus


def edges_current(spark, sf_dir: str):
    li = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    x, y = li.alias("x"), li.alias("y")
    return (
        x.join(y, (F.col("x.o") == F.col("y.o")) & (F.col("x.p") < F.col("y.p")))
        .select(F.col("x.p").alias("u"), F.col("y.p").alias("v"))
        .distinct()
    )


def edges_grouped(spark, sf_dir: str):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    parts = li.groupBy("o").agg(F.sort_array(F.collect_set("p")).alias("ps"))
    pairs = parts.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps) - i - 1),"
                " y -> struct(x AS u, y AS v))))"
            )
        ).alias("e")
    )
    return pairs.select("e.u", "e.v").distinct()


def timed(df_fn, spark, runs: int = 2):
    df_fn().write.format("noop").mode("overwrite").save()  # warm
    best, spill = None, None
    for _ in range(runs):
        s0 = _spill_totals(spark)
        t0 = time.monotonic()
        df_fn().write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        s1 = _spill_totals(spark)
        if best is None or dt < best:
            best, spill = dt, (s1[0] - s0[0], s1[1] - s0[1])
    return best, spill


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=100)
    args = ap.parse_args()

    spark = get_spark(app_name="triab", master="local[32]")
    tmp = tempfile.mkdtemp(prefix="triab_", dir=os.path.dirname(__file__))
    out = {"copies": args.copies}
    try:
        build_corpus(spark, tmp, args.copies)

        # equality first: both variants must build the SAME edge set
        n_a = edges_current(spark, tmp).count()
        n_b = edges_grouped(spark, tmp).count()
        assert n_a == n_b, (n_a, n_b)
        out["n_edges"] = n_a

        for name, fn in (("edges_current", edges_current), ("edges_grouped", edges_grouped)):
            sec, spill = timed(lambda f=fn: f(spark, tmp), spark)
            out[name] = {
                "sec": round(sec, 2),
                "mem_spill": spill[0],
                "disk_spill": spill[1],
            }
        for name, fn in (
            ("triangles_current", edges_current),
            ("triangles_grouped", edges_grouped),
        ):
            sec, spill = timed(
                lambda f=fn: triangle_counts(f(spark, tmp)), spark
            )
            out[name] = {
                "sec": round(sec, 2),
                "mem_spill": spill[0],
                "disk_spill": spill[1],
            }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
