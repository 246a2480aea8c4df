"""Join-heavy analytics + sessionization (engine completeness set).

Beyond the reference's own operator inventory: the fact-to-fact join
shapes every warehouse workload hits (TPC-H Q3/Q5 silhouettes over the
fixture star schema) and gap-based sessionization — the canonical custom
event-time operator.  These stress the planner paths that matter at
100 TB: multi-join reordering, broadcast-vs-shuffle choice, AQE
coalescing, and windowed cumulative state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_ingestion_backend_spark.operators.queries import DEC2, DEC4, _register
from data_ingestion_backend_spark.sources.fixtures import load_table

SESSION_GAP_MIN = 30


@_register(
    "q28_shipping_priority",
    """SELECT o.o_orderkey,
              CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))
                AS revenue,
              o.o_orderdate, o.o_orderpriority
       FROM customer c
       JOIN orders o ON o.o_custkey = c.c_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
         AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
       GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
       ORDER BY revenue DESC, o_orderkey
       LIMIT 20""",
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 silhouette: fact⋈fact⋈dim with selective filters + top-k.

    Scale shape: both fact filters push to the scans; the filtered
    customer dim broadcasts; lineitem⋈orders is the one real shuffle,
    on the join key both sides already aggregate by.  Top-k by revenue
    is TakeOrderedAndProject — no global sort of the aggregate.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,2)")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast(DEC4).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(20)
    )


@_register(
    "q29_regional_revenue",
    """SELECT r.r_name, n.n_name,
              CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))
                AS revenue,
              COUNT(*) AS line_count
       FROM region r
       JOIN nation n ON n.n_regionkey = r.r_regionkey
       JOIN customer c ON c.c_nationkey = n.n_nationkey
       JOIN orders o ON o.o_custkey = c.c_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       GROUP BY r.r_name, n.n_name
       ORDER BY r.r_name, n.n_name""",
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 silhouette: 5-table snowflake join → grouped rollup.

    region/nation broadcast (bounded tiny); customer joins orders then
    lineitem — Catalyst/AQE order the shuffles; decimal-exact revenue.
    """
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,2)")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(revenue).cast(DEC4).alias("revenue"),
            F.count("*").alias("line_count"),
        )
        .orderBy("r_name", "n_name")
    )


@_register(
    "q30_sessionize",
    f"""WITH ordered AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
                 CASE WHEN CAST(ts AS TIMESTAMP)
                        - LAG(CAST(ts AS TIMESTAMP)) OVER (
                            PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                        > INTERVAL '{SESSION_GAP_MIN} minutes'
                      OR LAG(CAST(ts AS TIMESTAMP)) OVER (
                            PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                        IS NULL
                 THEN 1 ELSE 0 END AS new_session
          FROM events
        ),
        tagged AS (
          SELECT user_id, ts, event_id,
                 CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_no
          FROM ordered
        )
        SELECT user_id, session_no, MIN(ts) AS session_start,
               MAX(ts) AS session_end, COUNT(*) AS n_events
        FROM tagged
        GROUP BY user_id, session_no
        ORDER BY user_id, session_no""",
)
def q30_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session).

    The classic custom event-time operator, expressed with the standard
    two-window trick: lag() marks session starts, a running sum numbers
    them, then one aggregation per (user, session).  All three steps
    share the same (user_id, ts) partitioning, so Spark plans ONE
    shuffle.  The streaming twin (`streaming.pipeline.sessionize_stream`)
    uses native session_window with a watermark and is equivalence-tested
    against this batch form.
    """
    gap_sec = SESSION_GAP_MIN * 60
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = load_table(spark, sf_dir, "events")
    prev_ts = F.lag("ts").over(order)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col("ts").cast("long") - prev_ts.cast("long") > gap_sec),
        1,
    ).otherwise(0)
    return (
        ev.select("user_id", "ts", "event_id")
        .withColumn("session_no", F.sum(new_session).over(running))
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "session_no")
    )
