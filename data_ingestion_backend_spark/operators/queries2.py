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

from data_ingestion_backend_spark.operators.queries import (
    _register,
    _register_standalone,
    dbl,
)
from data_ingestion_backend_spark.sources.fixtures import load_table

SESSION_GAP_MIN = 30
RANGE_JOIN_WINDOW_SEC = 600  # q32: events in the 10 min before each purchase
RANGE_JOIN_BIN_SEC = 600  # bucket width for the binned equi-join rewrite
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]  # pivot axis


@_register(
    "q28_shipping_priority",
    """SELECT o.o_orderkey,
              ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE), 4)
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
    on the join key both sides already aggregate by, hinted SHUFFLE_HASH
    (no consumer needs sort order — see q29 note).  Top-k by revenue
    is TakeOrderedAndProject — no global sort of the aggregate.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp"))
        .hint("shuffle_hash")
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
        .agg(dbl(F.sum(revenue), 4).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(20)
    )


@_register(
    "q29_regional_revenue",
    """SELECT r.r_name, n.n_name,
              ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE), 4)
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
    lineitem; decimal-exact revenue.  The one unavoidable fact-fact
    shuffle (lineitem⋈orders) is hinted SHUFFLE_HASH on the orders side:
    neither input needs sorted output, so sort-merge pays two O(n log n)
    sort passes for nothing — measured 1.34 s → 0.72 s at sf0.1.  The
    hash build is per-partition (orders rows / shuffle partitions), so
    the plan scales by adding partitions; AQE skew-split still applies.
    """
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").hint("shuffle_hash")
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
            dbl(F.sum(revenue), 4).alias("revenue"),
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


@_register(
    "q31_asof_join",
    """SELECT a.event_id AS purchase_id, a.user_id,
              a.ts AS p_ts, b.ts AS last_click_ts
       FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             FROM events WHERE event_type = 'purchase') a
       ASOF LEFT JOIN
            (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
             FROM events WHERE event_type = 'click') b
         ON a.user_id = b.user_id AND a.ts > b.ts
       ORDER BY purchase_id""",
)
def q31_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase picks up the latest STRICTLY-prior click
    timestamp for its user (point-in-time lookup, the quotes⋈trades shape).

    Spark-first rewrite: instead of a per-row range probe, union both
    sides and take a running conditional max over one (user_id, ts)
    window — a single shuffle, no join blow-up, and the same partitioning
    sessionization already uses.  Strictness is encoded in the sort key:
    purchases order BEFORE clicks at equal ts, so the preceding-rows
    frame can never see a same-timestamp click.  The DuckDB oracle uses
    its native ASOF JOIN — an independent algorithm for the same answer.
    """
    both = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_click"),
        )
    )
    prior = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(F.when(F.col("is_click") == 1, F.col("ts"))).over(prior)
    return (
        both.withColumn("last_click_ts", last_click)
        .filter(F.col("is_click") == 0)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
            "last_click_ts",
        )
        .orderBy("purchase_id")
    )


@_register(
    "q32_range_join",
    f"""SELECT p.event_id AS purchase_id, p.user_id,
               CAST(COUNT(*) AS BIGINT) AS n_prior,
               ROUND(CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,6))), 4)
                          AS DOUBLE), 4)
                 AS sum_value
        FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
              FROM events) e
          ON e.user_id = p.user_id
         AND e.ts >= p.ts - INTERVAL {RANGE_JOIN_WINDOW_SEC} SECOND
         AND e.ts < p.ts
        GROUP BY p.event_id, p.user_id
        ORDER BY purchase_id""",
)
def q32_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join, binned: activity in the 10 min before each
    purchase.

    A raw range-predicate join degenerates to a per-key nested loop.  The
    scalable rewrite buckets time into fixed bins, explodes the probe
    side onto every bin its window overlaps (≤2 here), equi-joins on
    (user_id, bin) — hash join, shuffles prune to exactly the candidate
    bins — then refines with the precise µs range filter.  Bin width is a
    dial: ~window size keeps the fan-out at ⌈w/b⌉+1 with minimal
    false candidates.  The DuckDB oracle runs the plain range join (its
    IEJoin), again an independent algorithm.
    """
    w, b = RANGE_JOIN_WINDOW_SEC, RANGE_JOIN_BIN_SEC
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    e = ev.select(
        "user_id", "ts", "value", (F.col("ts").cast("long") / b).cast("long").alias("bin")
    )
    probe = p.withColumn(
        "bin",
        F.explode(
            F.sequence(
                ((F.col("p_ts").cast("long") - w) / b).cast("long"),
                (F.col("p_ts").cast("long") / b).cast("long"),
            )
        ),
    )
    return (
        probe.join(e, (F.col("user_id") == F.col("p_user")) & (probe["bin"] == e["bin"]))
        .filter(
            (F.col("ts") >= F.col("p_ts") - F.expr(f"INTERVAL {w} SECOND"))
            & (F.col("ts") < F.col("p_ts"))
        )
        .groupBy("purchase_id", "p_user")
        .agg(
            F.count("*").alias("n_prior"),
            # Pre-round the exact decimal sum to the terminal scale (4 < the
            # summed scale 6) IN DECIMAL ARITHMETIC on both engines: a sum
            # whose 5th-6th digits are exactly '50' sits on a double-rounding
            # midpoint, and Spark/DuckDB could round a near-midpoint double
            # to different sides.  After the exact HALF_UP decimal round the
            # value is never on a midpoint of the final double round.
            dbl(F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4), 4).alias(
                "sum_value"
            ),
        )
        .select(
            "purchase_id",
            F.col("p_user").alias("user_id"),
            "n_prior",
            "sum_value",
        )
        .orderBy("purchase_id")
    )


@_register_standalone(
    "q33_rollup",
    """SELECT l_returnflag, l_linestatus,
              CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
                AS gid,
              ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
                AS sum_qty,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM lineitem
       GROUP BY ROLLUP (l_returnflag, l_linestatus)
       ORDER BY gid, l_returnflag, l_linestatus""",
)
def q33_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals: ROLLUP (flag, status) semantics — detail rows,
    per-flag subtotals, and the grand total, with gid the standard
    grouping bitmask distinguishing "NULL because subtotal" from a
    (hypothetical) NULL data value.

    TWO-PHASE rollup: Spark's native ``.rollup()`` on the raw table
    Expands every input row ×3 (one copy per grouping set) before the
    exchange, tripling shuffle input.  Here one ordinary groupBy produces
    the (tiny) detail aggregate and the native rollup runs over THAT —
    Expand ×3 of six rows is free, the subtotal tiers re-aggregate
    decimal sums (exact, associative), and the detail subplan appears
    once so nothing needs persisting.  Measured 1.18 s → 0.81 s at
    sf0.1; at 100 TB the win is the 3×-smaller shuffle.
    """
    detail = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
            F.count("*").alias("n"),
        )
    )
    return (
        detail.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            dbl(F.sum("sum_qty"), 2).alias("sum_qty"),
            F.sum("n").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


@_register_standalone(
    "q34_pivot",
    """SELECT user_id,
              CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
              CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
              CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
              CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
              CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
       FROM events
       GROUP BY user_id
       ORDER BY user_id""",
)
def q34_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: per-user event counts, one column per type.

    The pivot values are DECLARED (not discovered), which matters twice:
    no extra distinct-scan job to enumerate them, and a stable output
    schema the driver/oracle can hash.  Catalyst compiles this to the
    same single-pass conditional aggregation the oracle SQL spells out.
    """
    wide = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    renamed = wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}") for t in EVENT_TYPES],
    )
    return renamed.orderBy("user_id")


@_register(
    "q35_percentiles",
    """SELECT event_type,
              round(quantile_cont(value, 0.25), 6) AS p25,
              round(quantile_cont(value, 0.50), 6) AS p50,
              round(quantile_cont(value, 0.75), 6) AS p75,
              round(quantile_cont(value, 0.95), 6) AS p95
       FROM events
       GROUP BY event_type
       ORDER BY event_type""",
)
def q35_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT linear-interpolation percentiles per group (the GK sketch in
    sketches.py is the approximate/mergeable scale path; this is the
    verification-grade twin).  Spark's `percentile` matches DuckDB's
    `quantile_cont` definition; results rounded to 6 dp so the last-ulp
    interpolation arithmetic can't flip the value hash.
    """
    ev = load_table(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.25D, 0.50D, 0.75D, 0.95D))")
    agg = ev.groupBy("event_type").agg(pct.alias("ps"))
    return agg.select(
        "event_type",
        *[
            F.round(F.col("ps")[i], 6).alias(name)
            for i, name in enumerate(["p25", "p50", "p75", "p95"])
        ],
    ).orderBy("event_type")


@_register(
    "q36_sliding_range_count",
    """SELECT event_id, user_id,
              CAST(COUNT(*) OVER (
                PARTITION BY user_id ORDER BY epoch_s
                RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING) AS BIGINT)
                AS n_prev_hour
       FROM (SELECT event_id, user_id,
                    CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS BIGINT)
                      AS epoch_s
             FROM events)
       ORDER BY event_id""",
)
def q36_sliding_range_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-hour activity via a RANGE (value-based) frame —
    the frame boundary is a time offset, not a row count, so bursts at
    one timestamp are handled as peers and sparse users don't over-reach.
    One window = one shuffle on user_id; at 100 TB this partitioning is
    shared with sessionization/as-of, so the exchange is reusable.
    RANGE frames need a numeric sort key in both engines → epoch seconds
    (µs-exact division, see the ns→µs note in queries.py).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr("CAST(ts AS LONG)").alias("epoch_s")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, -1)
    )
    return (
        ev.withColumn("n_prev_hour", F.count("*").over(w))
        .select("event_id", "user_id", "n_prev_hour")
        .orderBy("event_id")
    )


@_register(
    "q37_funnel",
    """WITH e AS (
         SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
       ),
       v AS (
         SELECT user_id, MIN(ts) AS first_view
         FROM e WHERE event_type = 'view' GROUP BY user_id
       ),
       c AS (
         SELECT e.user_id, MIN(e.ts) AS first_click
         FROM e JOIN v ON v.user_id = e.user_id
         WHERE e.event_type = 'click' AND e.ts > v.first_view
         GROUP BY e.user_id
       ),
       p AS (
         SELECT e.user_id, MIN(e.ts) AS first_purchase
         FROM e JOIN c ON c.user_id = e.user_id
         WHERE e.event_type = 'purchase' AND e.ts > c.first_click
         GROUP BY e.user_id
       )
       SELECT v.user_id, v.first_view, c.first_click, p.first_purchase
       FROM v
       LEFT JOIN c ON c.user_id = v.user_id
       LEFT JOIN p ON p.user_id = v.user_id
       ORDER BY v.user_id""",
)
def q37_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: ordered view → click → purchase per user.

    Each stage is MIN(ts) strictly after the previous stage's timestamp —
    the staged-aggregation formulation (filter → join previous stage →
    min), which shuffles only (user, ts) pairs per stage and never
    materializes event sequences.  Each stage's input shrinks (funnel!),
    so the joins get cheaper as they go; all three aggregations are
    map-side combined.  The DuckDB oracle mirrors the logic on native
    nanosecond timestamps cast to µs (matching Spark's ns→µs load shim).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "first_view", "first_click", "first_purchase")
        .orderBy("user_id")
    )


@_register_standalone(
    "q38_cube",
    """SELECT l_returnflag, l_linestatus,
              CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
                AS gid,
              ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
                AS sum_qty,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM lineitem
       GROUP BY CUBE (l_returnflag, l_linestatus)
       ORDER BY gid, l_returnflag, l_linestatus""",
)
def q38_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (flag, status): all four grouping tiers, two-phase like q33.

    Native ``.cube()`` on the raw table Expands every input row ×4 before
    the exchange; here the (tiny, decimal-exact) detail aggregate is
    computed once and the native cube runs over it — Expand ×4 of six
    rows, every tier an exact decimal re-aggregation, single detail
    subplan (no persist).  gid uses the standard GROUPING bitmask (flag
    bit 2, status bit 1).  Same scale argument as q33 with a 4× instead
    of 3× shuffle win.
    """
    detail = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
            F.count("*").alias("n"),
        )
    )
    return (
        detail.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            dbl(F.sum("sum_qty"), 2).alias("sum_qty"),
            F.sum("n").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


@_register(
    "q33_rollup_cube",
    """SELECT 'cube' AS op, l_returnflag, l_linestatus,
              CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
                AS gid,
              ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
                AS sum_qty,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
       UNION ALL
       SELECT 'rollup' AS op, l_returnflag, l_linestatus,
              CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
                AS gid,
              ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
                AS sum_qty,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       ORDER BY op, gid, l_returnflag, l_linestatus""",
)
def q33_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged rollup+cube cert: both two-phase grouping rewrites in one
    driver-graded row (the individual q33/q38 forms stay standalone,
    locally oracled).

    The rollup tiers are exactly the cube tiers minus gid=2 (per-status),
    so instead of a union of two plans — which Spark will NOT merge (two
    full fact scans, no ReusedExchange across union arms) — the cube runs
    ONCE over the two-phase detail aggregate and each output row explodes
    into its tags: every row is 'cube', and rows with gid≠2 are also
    'rollup'.  One scan, one big shuffle, and a narrow map over the
    ~12-row cube result.  See q33_rollup / q38_cube for the two-phase
    scale rationale.
    """
    cube = q38_cube(spark, sf_dir)
    tags = (
        F.when(F.col("gid") == 2, F.array(F.lit("cube")))
        .otherwise(F.array(F.lit("cube"), F.lit("rollup")))
    )
    return (
        cube.select(F.explode(tags).alias("op"), "*")
        .orderBy("op", "gid", "l_returnflag", "l_linestatus")
    )


@_register(
    "q39_retention",
    """WITH e AS (
         SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events
       ),
       cohort AS (
         SELECT user_id, MIN(d) AS cohort_day FROM e GROUP BY user_id
       )
       SELECT CAST(c.cohort_day AS TIMESTAMP) AS cohort_day,
              CAST(date_diff('day', c.cohort_day, e.d) AS BIGINT) AS day_offset,
              CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
       FROM e JOIN cohort c ON c.user_id = e.user_id
       GROUP BY c.cohort_day, day_offset
       ORDER BY cohort_day, day_offset""",
)
def q39_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    counted as active per day-offset since joining.

    The other canonical product-analytics query beside the funnel.  Two
    aggregations: per-user first day (map-side combined), then
    distinct-user counts per (cohort, offset) — the distinct is over
    user_id, which both engines compute exactly; offsets stay in integer
    days so no engine week-epoch convention can drift.  cohort_day is
    internally a DATE but terminally TIMESTAMP (the canon-proven type;
    Spark DateType surfaces as pandas object-dtype `datetime.date` cells
    while DuckDB DATE becomes datetime64 — an unproven hash pairing).
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    cohort = e.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        e.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.expr("datediff(d, cohort_day)").cast("bigint").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").cast("bigint").alias("active_users"))
        .select(
            F.col("cohort_day").cast("timestamp").alias("cohort_day"),
            "day_offset",
            "active_users",
        )
        .orderBy("cohort_day", "day_offset")
    )


@_register(
    "q40_json_agg",
    """SELECT event_type,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
                AS sum_k,
              CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
                AS min_k,
              CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
                AS max_k
       FROM events
       GROUP BY event_type
       ORDER BY event_type""",
)
def q40_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing feeding aggregation: from_json with a declared
    schema (not per-key string extraction — one parse, typed struct,
    columns prune into it), then integer aggregates per event type.

    Scale: the parse is map-side, the aggregate is map-side combined; a
    declared schema also means corrupt documents surface as NULLs rather
    than runtime errors (PERMISSIVE semantics), which is the behavior a
    100 TB pipeline needs.  DuckDB oracle uses its native JSON extraction
    — a different parser arriving at the same integers.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.from_json(F.col("props"), "k BIGINT").alias("p"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("p.k").cast("bigint").alias("sum_k"),
            F.min("p.k").cast("bigint").alias("min_k"),
            F.max("p.k").cast("bigint").alias("max_k"),
        )
        .orderBy("event_type")
    )
