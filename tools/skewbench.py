#!/usr/bin/env python
"""Hot-key skew bench: the salted-agg and AQE-skew-join paths vs a REAL
hot key.

Builds a skewed corpus from $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1), multiplied ``--copies`` times (id-offset, as in
stress5x) and then deliberately skewed:

- **events**: every row with ``event_id % 5 == 0`` is reassigned to ONE
  hot user → that user owns exactly 20% of all events (the fixture's
  organic distribution is near-uniform, so without this the salted path
  never faces what it was built for).
- **lineitem**: every row with ``l_orderkey % 5 == 0`` is reassigned to
  ONE hot (existing) orderkey → the q29 fact⋈fact shuffle gets a reducer
  with 20% of the probe side.

Measured (best-of-2 each, noop sink):

1. plain ``groupBy(user_id)`` totals on the skewed events;
2. the same totals via ``salted_aggregate`` (16 salts) — results are
   asserted EQUAL to plain before timing is reported;
3. q29_regional_revenue on the skewed corpus with AQE skew-join ON vs
   OFF (thresholds lowered so the splitter can see test-scale
   partitions; at 100 TB the defaults trigger naturally).

Prints one JSON line for SCALE.md §8.

Measured finding (recorded there): for DECOMPOSABLE aggregates Spark's
map-side partial aggregation already neutralizes a hot GROUP BY key —
each map task emits ONE partial row per key, so the hot reducer merges
n_mappers rows, not n_rows — and salting only adds a second shuffle.
The salted path earns its keep where partial state does NOT compress
(collect-style/exact-distinct aggregation states), while JOIN-side skew
is AQE skew-split's job (measured ~1.7x on q29 here).

Usage: python tools/skewbench.py [--copies N]
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

from data_ingestion_backend_spark.operators.queries import DEC2
from data_ingestion_backend_spark.operators.scale import salted_aggregate
from data_ingestion_backend_spark.plans.session import get_spark
from data_ingestion_backend_spark.registry import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HOT_FRACTION_MOD = 5  # id % 5 == 0 → exactly 20% of rows to the hot key


def build_skewed(spark, out_dir: str, copies: int) -> dict:
    info = {}
    # events: multiply, then funnel 20% of rows to one hot user
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    eb = ev.agg(F.max("event_id"), F.max("user_id")).collect()[0]
    parts = []
    for i in range(copies):
        parts.append(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * (eb[0] + 1)))
            .withColumn("user_id", F.col("user_id") + F.lit(i * (eb[1] + 1)))
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    hot_user = 0
    big = big.withColumn(
        "user_id",
        F.when(F.col("event_id") % HOT_FRACTION_MOD == 0, F.lit(hot_user)).otherwise(
            F.col("user_id")
        ),
    )
    big.write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))
    info["hot_user"] = hot_user

    # orders + lineitem: multiply on a SHARED orderkey base, then funnel
    # 20% of lineitem rows to one hot existing orderkey
    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    base = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    hot_key = orders.agg(F.min("o_orderkey")).collect()[0][0]
    o_parts, l_parts = [], []
    for i in range(copies):
        o_parts.append(orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * base)))
        l_parts.append(li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * base)))
    o_big, l_big = o_parts[0], l_parts[0]
    for p in o_parts[1:]:
        o_big = o_big.unionByName(p)
    for p in l_parts[1:]:
        l_big = l_big.unionByName(p)
    l_big = l_big.withColumn(
        "l_orderkey",
        F.when(F.col("l_orderkey") % HOT_FRACTION_MOD == 0, F.lit(hot_key)).otherwise(
            F.col("l_orderkey")
        ),
    )
    o_big.write.mode("overwrite").parquet(os.path.join(out_dir, "orders.parquet"))
    l_big.write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))
    info["hot_orderkey"] = hot_key

    for t in "region nation customer supplier part documents embeddings".split():
        src = os.path.join(SF_DIR, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    return info


def timed(thunk) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        thunk()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    spark = get_spark(app_name="skewbench", master="local[32]")
    tmp = tempfile.mkdtemp(prefix="skew_", dir=os.path.dirname(__file__))
    try:
        info = build_skewed(spark, tmp, args.copies)
        ev = spark.read.parquet(os.path.join(tmp, "events.parquet")).select(
            "user_id", "event_id", F.col("value").cast(DEC2).alias("v")
        )
        n_total = ev.count()
        n_hot = ev.filter(F.col("user_id") == info["hot_user"]).count()

        plain_df = ev.groupBy("user_id").agg(
            F.count("*").alias("n_events"), F.sum("v").alias("total_value")
        )
        salted_df = salted_aggregate(
            ev,
            ["user_id"],
            {"n_events": F.count("*"), "total_value": (F.sum("v"), "sum")},
            salt_source="event_id",
        )
        # correctness first: salted must be bit-identical to plain
        diff = (
            plain_df.withColumnRenamed("n_events", "pn")
            .withColumnRenamed("total_value", "pv")
            .join(salted_df, "user_id", "full")
            .filter(
                (F.col("pn") != F.col("n_events"))
                | (F.col("pv") != F.col("total_value"))
                | F.col("pn").isNull()
                | F.col("n_events").isNull()
            )
            .count()
        )
        assert diff == 0, f"salted != plain on {diff} users"

        def sink(df):
            return lambda: df.write.format("noop").mode("overwrite").save()

        t_plain = timed(sink(plain_df))
        t_salted = timed(sink(salted_df))

        # q29 under the skewed fact join: AQE skew split on vs off
        skew_conf = {
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8MB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4MB",
        }
        saved = {k: spark.conf.get(k) for k in skew_conf}
        q29 = QUERIES["q29_regional_revenue"]
        for k, v in skew_conf.items():
            spark.conf.set(k, v)
        t_q29_skewfix = timed(sink(q29(spark, tmp)))
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t_q29_noskewfix = timed(sink(q29(spark, tmp)))
        for k, v in saved.items():
            spark.conf.set(k, v)

        # --- salted JOIN: the skew shape AQE's defenses can miss -------
        # lineitem⋈orders on the 20%-hot orderkey with broadcast DISABLED
        # (modelling a dim past autoBroadcastJoinThreshold → sort-merge).
        # Three arms, results asserted equal before timing:
        #   plain SMJ (skew split off) / AQE skew split / salted_join
        from data_ingestion_backend_spark.operators.scale import salted_join

        li = spark.read.parquet(os.path.join(tmp, "lineitem.parquet")).select(
            F.col("l_orderkey").alias("o_orderkey"),
            "l_linenumber",
            F.col("l_extendedprice").cast(DEC2).alias("price"),
        )
        od = spark.read.parquet(os.path.join(tmp, "orders.parquet")).select(
            "o_orderkey", "o_custkey", "o_orderpriority"
        )
        bcast_saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def joined(df):
            return df.groupBy("o_orderpriority").agg(
                F.count("*").alias("n"), F.sum("price").alias("rev")
            )

        plain_j = joined(li.join(od, "o_orderkey"))
        salted_j = joined(
            salted_join(
                li, od, "o_orderkey", [info["hot_orderkey"]],
                fact_salt_source="l_linenumber", n_salts=32,
            )
        )
        jdiff = (
            plain_j.withColumnRenamed("n", "pn").withColumnRenamed("rev", "pv")
            .join(salted_j, "o_orderpriority", "full")
            .filter(
                (F.col("pn") != F.col("n")) | (F.col("pv") != F.col("rev"))
                | F.col("pn").isNull() | F.col("n").isNull()
            )
            .count()
        )
        assert jdiff == 0, f"salted_join != plain join on {jdiff} groups"

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t_join_plain = timed(sink(plain_j))
        t_join_salted = timed(sink(salted_j))
        for k, v in skew_conf.items():
            spark.conf.set(k, v)
        t_join_aqe = timed(sink(plain_j))
        for k, v in saved.items():
            spark.conf.set(k, v)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast_saved)

        out = {
            "copies": args.copies,
            "n_events": n_total,
            "hot_user_rows": n_hot,
            "hot_frac": round(n_hot / n_total, 4),
            "agg_plain_sec": round(t_plain, 3),
            "agg_salted_sec": round(t_salted, 3),
            "q29_skewjoin_on_sec": round(t_q29_skewfix, 3),
            "q29_skewjoin_off_sec": round(t_q29_noskewfix, 3),
            "join_nobcast_plain_sec": round(t_join_plain, 3),
            "join_nobcast_salted_sec": round(t_join_salted, 3),
            "join_nobcast_aqeskew_sec": round(t_join_aqe, 3),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
