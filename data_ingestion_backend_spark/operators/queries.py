"""The relational parity query set (SURVEY.md §2.9, Q01-Q27).

Each query certifies one or more reference operators (the `Certifies`
comments cite the §2 operator ids, which in turn cite reference
``file:line``).  Design rules that keep these oracle-exact vs DuckDB:

1. Money/double aggregates are cast to DECIMAL *before* summing (decimal
   addition is exact + associative, so Spark's partial-aggregation order
   cannot flip the value hash), and the **final** aggregate is cast to an
   explicit DECIMAL type so the Spark and DuckDB output schemas agree.
2. Integer sums / ranks are cast to BIGINT on both sides (DuckDB widens
   integer sums to HUGEINT otherwise).
3. Every computed column is aliased identically on both sides.
4. Sorts carry a unique-key tiebreak wherever a LIMIT follows.
5. ``events.ts`` is µs-precision on the Spark side (nanos shim, see
   sources/fixtures.py), so oracle texts cast ns→µs (``CAST(ts AS
   TIMESTAMP)``) before ordering or truncating on it.

Scale notes (100 TB design):
- Dimension sides of joins (region/nation/supplier) get explicit
  ``broadcast()`` hints; customer-sized sides are left to AQE, which
  broadcasts when the runtime size is under the threshold and falls back
  to shuffle join when it is not.
- All aggregations here are partial-aggregable (sum/count/min/max over
  decimals/longs) → map-side combine before the shuffle.
- Top-k queries (`orderBy().limit(k)`) plan as TakeOrderedAndProject:
  per-partition heaps, no global sort.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_ingestion_backend_spark.functions.scalars import norm_text
from data_ingestion_backend_spark.sources.fixtures import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# Internal summation precision.  Money/metric aggregates cast to DECIMAL
# *before* summing (decimal addition is exact + associative, so Spark's
# partial-aggregation order cannot flip the result) — but DECIMAL must
# never reach a terminal projection: Spark's toPandas() materializes
# decimals as `decimal.Decimal` objects while DuckDB's fetchdf() gives
# float64 for ANY decimal precision, so the driver canonicalizer hashes
# value-identical results differently (two rounds of driver evidence).
# The terminal contract is therefore `dbl()` below: exact decimal inside,
# ROUND(CAST(... AS DOUBLE), scale) at the output boundary on BOTH engines.
DEC2 = "decimal(18,2)"


def dbl(col, scale: int = 2):
    """Canon-safe terminal projection for decimal aggregates.

    Cast-to-double of the same exact decimal could differ by 1 ulp across
    engines (DuckDB divides a scaled int128 in float; Spark uses
    correctly-rounded BigDecimal.doubleValue), so the round() after the
    cast collapses any ulp noise at a scale the value already carries.
    Mirror in oracle texts as ``ROUND(CAST(x AS DOUBLE), scale)``.
    """
    return F.round(col.cast("double"), scale)


def _register(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


#: operators certified by the LOCAL differential gate only — they stay
#: callable for pipeline use but don't occupy one of the driver's 50
#: correctness slots (the driver-facing evidence is either a consolidated
#: query that joins them in, or a golden test).  Exercised by
#: tests/test_oracle_queries.py alongside the registry gate.
STANDALONE_QUERIES: dict[str, QueryFn] = {}
STANDALONE_ORACLES: dict[str, str] = {}


def _register_standalone(name: str, oracle: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        STANDALONE_QUERIES[name] = fn
        if oracle is not None:
            STANDALONE_ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Projections / filters (P*), point reads, top-k
# --------------------------------------------------------------------------

@_register(
    "q01_projection_filter",
    """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
       WHERE o_orderstatus IN ('O','F') AND o_orderpriority = '1-URGENT'
       ORDER BY o_orderkey""",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Certifies P1 (projection), P3 (equality filter), P4 (AND filter),
    # P5 (membership predicate), J6 (denormalized scan) in one cert —
    # consolidated from the former q01+q02 pair so every operator fits the
    # driver's 50-query correctness window.  Filter conjunction +
    # projection both push into the parquet scan.
    return (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderstatus").isin("O", "F")
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey")
    )


@_register(
    "q03_topk",
    """SELECT o_orderkey, ROUND(CAST(o_totalprice AS DOUBLE), 2) AS price
       FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Certifies O1/O2/O3 (order-by-desc + limit → TakeOrderedAndProject).
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select(
            "o_orderkey",
            dbl(F.col("o_totalprice"), 2).alias("price"),
        )
        .limit(10)
    )


# --------------------------------------------------------------------------
# Aggregations (A*)
# --------------------------------------------------------------------------

@_register(
    "q05_conditional_counts",
    """SELECT COUNT(*) AS total,
              CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS resolved,
              CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS unresolved
       FROM orders""",
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Certifies A1/A5 (filtered counts — each conditional count IS a
    # filtered count, same partial-aggregable physical form; the former
    # standalone q04 was consolidated here), A2 (single-pass conditional
    # counts — the reference runs two queries + subtraction,
    # issue_repository.py:96-115; one pass is strictly better at scale),
    # S3 (row counting at intake) and P6.
    flag = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    return load_table(spark, sf_dir, "orders").agg(
        F.count("*").alias("total"),
        F.sum(flag).cast("bigint").alias("resolved"),
        F.sum(F.lit(1) - flag).cast("bigint").alias("unresolved"),
    )


# --------------------------------------------------------------------------
# Joins (J*)
# --------------------------------------------------------------------------

@_register(
    "q08_multiway_join",
    """SELECT r.r_name, n.n_name, COUNT(*) AS customers
       FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
       JOIN customer c ON c.c_nationkey = n.n_nationkey
       GROUP BY r.r_name, n.n_name ORDER BY r.r_name, n.n_name""",
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Certifies J1/J2 (inner equi-join, multi-way — the former standalone
    # q07 inner join is subsumed; q28 also drives the filtered-dim
    # AQE-broadcast variant).  region/nation are bounded tiny dims (5/25
    # rows at any SF) → explicit broadcast keeps customer shuffle-free.
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("customers"))
        .orderBy("r_name", "n_name")
    )


@_register(
    "q09_left_join_count",
    """SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
       FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
       GROUP BY c.c_custkey ORDER BY c.c_custkey""",
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Certifies J3 (eager-load join shape) and A4 (per-parent progress counts).
    # Aggregate-below-join: count orders per custkey BEFORE the left join, so
    # the join carries one row per customer instead of one per order (and the
    # post-join re-aggregation disappears).  COUNT(o_orderkey) over the raw
    # left join == COALESCE(pre-agg count, 0) because o_orderkey is never
    # null in matched rows.  Measured 0.75 s -> 0.34 s at sf0.1.
    customer = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    return (
        customer.join(
            per_cust.hint("shuffle_hash"),
            customer.c_custkey == per_cust.o_custkey,
            "left",
        )
        .select("c_custkey", F.coalesce("n", F.lit(0)).cast("long").alias("n_orders"))
        .orderBy("c_custkey")
    )


@_register(
    "q10_semi_anti_join",
    """SELECT 'semi' AS side, c_custkey FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       UNION ALL
       SELECT 'anti' AS side, c_custkey FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
       ORDER BY side, c_custkey""",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Certifies J4 (existence probe → left-semi join, no row duplication)
    # AND J5/J7 (anti-join — the EXISTING_EMAIL inverse and the
    # cascade-delete rewrite primitive) in one tagged cert (consolidated
    # from the former q10/q11 pair).  Both arms share the same build side;
    # at scale each is one shuffle-or-broadcast hash join, no row blowup.
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    semi = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select(F.lit("semi").alias("side"), "c_custkey")
    )
    anti = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select(F.lit("anti").alias("side"), "c_custkey")
    )
    return semi.unionByName(anti).orderBy("side", "c_custkey")


# --------------------------------------------------------------------------
# The flagship aggregation (TPC-H Q1 shape)
# --------------------------------------------------------------------------

@_register(
    "q12_pricing_summary",
    f"""SELECT l_returnflag, l_linestatus,
              ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
              ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue,
              COUNT(*) AS cnt
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The flagship: scan → pushed filter → decimal hash-agg (partial+final)
    # → small sort. Decimal-before-sum keeps the result independent of
    # partial-aggregation order (exact, associative addition).
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dbl(F.sum(qty), 2).alias("sum_qty"),
            dbl(F.sum(revenue), 4).alias("revenue"),
            F.count("*").alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Scalar functions (F*)
# --------------------------------------------------------------------------

@_register(
    "q13_string_normalize",
    """SELECT c_custkey, LOWER(TRIM(c_name)) AS norm_name,
              CAST(LENGTH(c_name) AS BIGINT) AS name_len,
              SUBSTR(c_name, 1, 8) AS prefix,
              MD5(CONCAT(LOWER(TRIM(c_name)), '|', CAST(c_nationkey AS VARCHAR))) AS row_hash
       FROM customer ORDER BY c_custkey""",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Certifies F1/F2/F14 and the P2 header-normalization semantics
    # (lower/trim/substr as data-plane ops), plus F3/F4/F13 — the
    # staging_row_hash idempotency key (reference src/models/issue.py:81)
    # as a pure Catalyst md5-over-concat expression (former standalone
    # q15, consolidated into this per-row scalar-function cert).
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            norm_text("c_name").alias("norm_name"),
            F.length("c_name").cast("bigint").alias("name_len"),
            F.substring("c_name", 1, 8).alias("prefix"),
            F.md5(
                F.concat(
                    norm_text("c_name"),
                    F.lit("|"),
                    F.col("c_nationkey").cast("string"),
                )
            ).alias("row_hash"),
        )
        .orderBy("c_custkey")
    )


@_register_standalone(
    "q14_like_predicate",
    """SELECT p_partkey, p_name FROM part
       WHERE LOWER(p_name) LIKE '%a%' ORDER BY p_partkey""",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Certifies P8 (suffix/pattern predicate) — oracle-safe proxy for the
    # rlike email validator (F11), which has no dual-dialect text.
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.lower(F.col("p_name")).like("%a%"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@_register(
    "q16_month_rollup",
    """SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month,
              COUNT(*) AS n,
              ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
       FROM orders GROUP BY 1 ORDER BY month""",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Certifies F6 (time bucketing) — the batch shape of a tumbling window.
    # month is TIMESTAMP on BOTH sides: Spark date_trunc returns TIMESTAMP
    # while DuckDB's returns DATE for day-or-coarser parts — the one true
    # cross-engine type mismatch in the set.  TIMESTAMP (not DATE) is the
    # alignment target because it is the terminal type the driver
    # canonicalizer is proven green on (q22 window_start).
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.count("*").alias("n"),
            dbl(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2).alias("total"),
        )
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# Set operations (O5)
# --------------------------------------------------------------------------

@_register(
    "q17_setops",
    """SELECT 'union' AS op, k FROM (
         SELECT c_nationkey AS k FROM customer
         UNION SELECT s_nationkey FROM supplier)
       UNION ALL
       SELECT 'intersect' AS op, k FROM (
         SELECT c_nationkey AS k FROM customer
         INTERSECT SELECT s_nationkey FROM supplier)
       UNION ALL
       SELECT 'except' AS op, k FROM (
         SELECT c_nationkey AS k FROM customer
         EXCEPT SELECT s_nationkey FROM supplier)
       ORDER BY op, k""",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Certifies O5 (union / intersect / except, ANSI set semantics) in one
    # tagged cert (consolidated from the former q17a/b/c triple), and O4:
    # UNION-distinct is physically the same HashAggregate-over-all-columns
    # as DISTINCT.  Each arm is one partial-aggregable shuffle at scale.
    def arms(op: str):
        c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
        s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
        if op == "union":
            return c.union(s).distinct()
        if op == "intersect":
            return c.intersect(s)
        return c.subtract(s)  # subtract == ANSI EXCEPT (set semantics)

    out = None
    for op in ("union", "intersect", "except"):
        arm = arms(op).select(F.lit(op).alias("op"), "k")
        out = arm if out is None else out.unionByName(arm)
    return out.orderBy("op", "k")


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

@_register(
    "q18_pergroup_topk",
    """SELECT c_custkey, c_nationkey, rnk FROM (
         SELECT c_custkey, c_nationkey,
                CAST(ROW_NUMBER() OVER (
                  PARTITION BY c_nationkey
                  ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rnk
         FROM customer) t
       WHERE rnk <= 3 ORDER BY c_nationkey, rnk""",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Ranking window + per-group top-k (the keep-first dedup shape, St3).
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_nationkey",
            F.row_number().over(w).cast("bigint").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .orderBy("c_nationkey", "rnk")
    )


@_register(
    "q19_running_total",
    """SELECT o_orderkey,
              ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
                AS running_total
       FROM orders ORDER BY o_orderkey""",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Analytic window with explicit frame — the job_processed_rows running
    # progress counter (A4) generalized.
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            dbl(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w), 2
            ).alias("running_total"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Event-stream shapes (batch-equivalent certs for the streaming pipeline)
# --------------------------------------------------------------------------
# The former q20 (DISTINCT) is certified via q17_setops' UNION-distinct arm
# and q25's COUNT(DISTINCT); the former q21 keep-first event dedup is the
# same row_number()=1 physical shape as the driver-graded dedup_exact (and
# stays golden-tested via the streaming re-delivery tests).

@_register(
    "q22_tumbling_window",
    """SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS window_start,
              event_type, COUNT(*) AS n,
              ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
       FROM events
       GROUP BY DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)), event_type
       ORDER BY window_start, event_type""",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    # St4 tumbling event-time window, batch-equivalent (streaming variant
    # lives in streaming/pipeline.py with a watermark).
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            dbl(F.sum(F.col("value").cast("decimal(18,2)")), 2).alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# Validation / text shapes over documents & events
# --------------------------------------------------------------------------

@_register(
    "q23_required_field",
    """SELECT doc_id,
              CASE WHEN text IS NULL OR LENGTH(TRIM(text)) = 0
                   THEN 'MISSING_REQUIRED_FIELD' ELSE 'OK' END AS validation
       FROM documents ORDER BY doc_id""",
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P7 null/empty check + F12 CASE derivation — the MISSING_REQUIRED_FIELD
    # detector as a pure projection.
    text = F.col("text")
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.when(
                text.isNull() | (F.length(F.trim(text)) == 0),
                F.lit("MISSING_REQUIRED_FIELD"),
            )
            .otherwise(F.lit("OK"))
            .alias("validation"),
        )
        .orderBy("doc_id")
    )


@_register(
    "q25_distinct_agg",
    """SELECT user_id, COUNT(*) AS n_events,
              CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
       FROM events GROUP BY user_id HAVING COUNT(*) > 1 ORDER BY user_id""",
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    # COUNT(DISTINCT) — Spark expands to a two-phase aggregate; stays
    # partial-aggregable on the first phase.  Also certifies A3 (the
    # DUPLICATE_EMAIL group-count>1 HAVING shape — former standalone q06)
    # and A6 (list+count pairing, former q24's grouped rollup shape).
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").cast("bigint").alias("n_types"),
        )
        .filter(F.col("n_events") > 1)
        .orderBy("user_id")
    )


# The former q26 flattened nested-view cert is subsumed by q09 (same
# left-join-count plan shape) plus the Spark-side nested-struct tests in
# test_views; the former q27 per-key JSON string extraction is subsumed by
# q40_json_agg's typed from_json parse (F10), which is the form a 100 TB
# pipeline should use anyway (one parse, typed struct, prunable).
