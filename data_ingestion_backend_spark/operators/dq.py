"""Declarative data-quality expectations (Deequ-style violations report).

The reference validates per-row at intake and files issues
(``src/services/csv_validator.py:84-265``: MISSING_REQUIRED,
INVALID_EMAIL, DUPLICATE_EMAIL, EXISTING_EMAIL); this operator is the
same idea lifted to TABLE-level contracts on the warehouse: each
expectation compiles to an aggregate over one scan, and the report is
the union of (rule, table, n_rows, n_violations, pass) rows — the gate a
100 TB pipeline runs BEFORE promoting a snapshot, where "fail the
promotion" beats "poison the corpus".

Shapes, chosen for scale:
- not-null / set-membership / range rules fold into ONE conditional
  aggregation per table (single pass, map-side partial);
- uniqueness is one groupBy on the key counting keys seen more than
  once (the A3 DUPLICATE shape);
- referential integrity is a LEFT ANTI join, child against parent keys
  (the J5 shape; the parent side is a distinct key projection that AQE
  broadcasts when it fits).

Everything is exact and engine-independent, so the whole report carries
a DuckDB differential oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.queries import _register_standalone
from data_ingestion_backend_spark.sources.fixtures import load_table


def _report_row(rule: str, table: str, n_rows, n_viol) -> list:
    return [
        F.lit(rule).alias("rule"),
        F.lit(table).alias("table_name"),
        n_rows.cast("bigint").alias("n_rows"),
        n_viol.cast("bigint").alias("n_violations"),
        (n_viol == 0).alias("passed"),
    ]


def conditional_expectations(
    df: DataFrame, table: str, rules: dict[str, F.Column]
) -> DataFrame:
    """All predicate rules over ``df`` in ONE aggregation pass; each rule
    maps name → violation predicate (TRUE = row violates)."""
    aggs = [F.count("*").alias("_n")] + [
        F.sum(F.when(pred, 1).otherwise(0)).alias(f"_v_{i}")
        for i, pred in enumerate(rules.values())
    ]
    wide = df.agg(*aggs)
    # one aggregated row exploded to one row per rule — a union of
    # per-rule selects would re-execute the aggregate (and re-scan the
    # table) once per rule; the explode keeps it at exactly one pass
    rule_structs = F.array(
        *[
            F.struct(
                F.lit(rule).alias("rule"), F.col(f"_v_{i}").alias("_v")
            )
            for i, rule in enumerate(rules)
        ]
    )
    return wide.select(F.col("_n"), F.explode(rule_structs).alias("r")).select(
        F.col("r.rule").alias("rule"),
        F.lit(table).alias("table_name"),
        F.col("_n").cast("bigint").alias("n_rows"),
        F.col("r._v").cast("bigint").alias("n_violations"),
        (F.col("r._v") == 0).alias("passed"),
    )


def unique_expectation(df: DataFrame, table: str, key: str) -> DataFrame:
    """n_violations = rows carrying a key that occurs more than once."""
    dup = (
        df.groupBy(key)
        .agg(F.count("*").alias("c"))
        .where(F.col("c") > 1)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("_v"))
    )
    n = df.agg(F.count("*").alias("_n"))
    return dup.crossJoin(n).select(
        *_report_row(f"unique:{key}", table, F.col("_n"), F.col("_v"))
    )


def fk_expectation(
    child: DataFrame, child_table: str, fk: str, parent: DataFrame, pk: str
) -> DataFrame:
    """n_violations = child rows whose fk matches no parent key."""
    orphans = child.join(
        parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    ).agg(F.count("*").alias("_v"))
    n = child.agg(F.count("*").alias("_n"))
    return orphans.crossJoin(n).select(
        *_report_row(f"fk:{fk}", child_table, F.col("_n"), F.col("_v"))
    )


_DQ_ORACLE = """
WITH o AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_null,
         SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS v_set,
         SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS v_range
  FROM orders
),
l AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS v_qty,
         SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS v_disc
  FROM lineitem
),
dup AS (
  SELECT COALESCE(SUM(c), 0) AS v FROM (
    SELECT o_orderkey, COUNT(*) AS c FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
  )
),
orph AS (
  SELECT COUNT(*) AS v FROM lineitem
  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
)
SELECT rule, table_name, n_rows, n_violations, (n_violations = 0) AS passed
FROM (
  SELECT 'not_null:o_custkey' AS rule, 'orders' AS table_name,
         CAST(n AS BIGINT) AS n_rows, CAST(v_null AS BIGINT) AS n_violations FROM o
  UNION ALL
  SELECT 'set:o_orderstatus', 'orders', CAST(n AS BIGINT), CAST(v_set AS BIGINT) FROM o
  UNION ALL
  SELECT 'range:o_totalprice>0', 'orders', CAST(n AS BIGINT), CAST(v_range AS BIGINT) FROM o
  UNION ALL
  SELECT 'range:l_quantity>0', 'lineitem', CAST(n AS BIGINT), CAST(v_qty AS BIGINT) FROM l
  UNION ALL
  SELECT 'range:l_discount_in_0_1', 'lineitem', CAST(n AS BIGINT), CAST(v_disc AS BIGINT) FROM l
  UNION ALL
  SELECT 'unique:o_orderkey', 'orders',
         (SELECT CAST(n AS BIGINT) FROM o), CAST(v AS BIGINT) FROM dup
  UNION ALL
  SELECT 'fk:l_orderkey', 'lineitem',
         (SELECT CAST(n AS BIGINT) FROM l), CAST(v AS BIGINT) FROM orph
)
ORDER BY rule, table_name"""


@_register_standalone("dq_star_expectations", _DQ_ORACLE)
def dq_star_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-promotion quality gate over the orders/lineitem star:
    null/set/range contracts (one pass per table), key uniqueness, and
    child→parent referential integrity — one report, fully oracled."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    report = (
        conditional_expectations(
            orders,
            "orders",
            {
                "not_null:o_custkey": F.col("o_custkey").isNull(),
                "set:o_orderstatus": ~F.col("o_orderstatus").isin("O", "F", "P"),
                "range:o_totalprice>0": F.col("o_totalprice") <= 0,
            },
        )
        .unionByName(
            conditional_expectations(
                lineitem,
                "lineitem",
                {
                    "range:l_quantity>0": F.col("l_quantity") <= 0,
                    "range:l_discount_in_0_1": (F.col("l_discount") < 0)
                    | (F.col("l_discount") > 1),
                },
            )
        )
        .unionByName(unique_expectation(orders, "orders", "o_orderkey"))
        .unionByName(
            fk_expectation(lineitem, "lineitem", "l_orderkey", orders, "o_orderkey")
        )
    )
    return report.orderBy("rule", "table_name")


# --------------------------------------------------------------------------
# equi-width histogram profiling (integer-exact bucket edges)
# --------------------------------------------------------------------------

HIST_BUCKETS = 20

_HIST_ORACLE = f"""
WITH cents AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem
),
bounds AS (
  SELECT MIN(c) AS lo,
         ((MAX(c) - MIN(c)) // {HIST_BUCKETS}) + 1 AS width
  FROM cents
)
SELECT (c - lo) // width AS bucket,
       lo + ((c - lo) // width) * width AS lo_cents,
       lo + ((c - lo) // width + 1) * width - 1 AS hi_cents,
       COUNT(*) AS n
FROM cents, bounds
GROUP BY 1, 2, 3
ORDER BY bucket
"""


@_register_standalone("dq_histogram_price", _HIST_ORACLE)
def dq_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of ``l_extendedprice`` — the column-profile
    primitive behind data-quality dashboards and optimizer-style value
    distributions (the reference's intake report
    ``src/app/services/csv_validator.py:339-354`` stops at counts; this
    is the distribution the report implies).

    Bucketing is INTEGER-EXACT end to end: prices move to cents via
    ``round(x*100)`` (ROUND, not a bare cast — the parquet doubles sit
    ±1 ulp off the cent grid, and Spark's double→bigint cast truncates
    while DuckDB's rounds, so the bare cast splits engines exactly
    there), then width = ``(max-min) div B + 1`` guarantees max lands in
    bucket B-1 with zero float boundary hazard — ``floor((x-min)/width)``
    on doubles is exactly the idiom the cross-engine memo forbids.  All
    bucket/edge arithmetic past the rounding is BIGINT on both engines.

    Scale: one global MIN/MAX aggregate (map-side combinable, broadcast
    back as a 1-row frame) + one groupBy over {HIST_BUCKETS} keys — two
    scans, no shuffle wider than the bucket count.  The two-pass shape
    is the standard exact-histogram plan; the one-pass alternative
    (fixed pre-agreed edges) degenerates to a plain groupBy.
    """
    cents = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("c")
        )
    )
    bounds = cents.agg(
        F.min("c").alias("lo"), F.max("c").alias("hi")
    ).select(
        "lo",
        (F.expr(f"(hi - lo) div {HIST_BUCKETS}") + 1).alias("width"),
    )
    bkt = F.expr("(c - lo) div width")
    return (
        cents.crossJoin(F.broadcast(bounds))
        .select(
            bkt.alias("bucket"),
            (F.col("lo") + bkt * F.col("width")).alias("lo_cents"),
            (F.col("lo") + (bkt + 1) * F.col("width") - 1).alias("hi_cents"),
        )
        .groupBy("bucket", "lo_cents", "hi_cents")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )
