"""Correlated scalar-subquery shapes (TPC-H Q17/Q2/Q20 silhouettes).

The reference has no correlated SQL of its own, but its repository
layer computes the same shape imperatively — two queries, an aggregate
then a per-entity comparison against it (reference
``src/app/repository/issue_repository.py:96-115``, count + subtract per
job).  An analytics user hits the declarative form early: "rows whose
value relates to an aggregate over their OWN group".  These three certs
pin that Catalyst DECORRELATES the subquery — rewrites it into one
aggregation joined back to the outer query — rather than re-executing
the inner query per outer row (the O(n²) trap naive engines fall into).

All three run through the SQL text surface (``plans/catalog.run_sql``)
because correlated scalar subqueries are exactly the shape the
DataFrame builder API cannot express directly — the SQL path is the
product surface here, not a convenience.  The SAME text serves as the
DuckDB oracle: the queries are written in the portable ANSI subset both
engines parse, so the cert is text-identical by construction (terminal
discipline per the repo rule: exact-decimal sums rounded before the
double cast; raw parquet doubles passed through untouched).

Scale shapes (all pinned in ``tests/test_sql_surface.py``):

- q41 (Q17): the decorrelated inner aggregate is per-partkey over the
  SAME fact — one map-side-combined shuffle on l_partkey, joined back
  on l_partkey (co-partitioned with the aggregation output, no second
  fact shuffle), dim filter broadcast.
- q42 (Q2 min-per-group join-back): inner MIN(o_orderdate) per custkey
  aggregates the fact once, joins back on (custkey, orderdate) —
  equivalent to the window-rank form but with a partial-agg-sized
  shuffle instead of a full sort of the fact.
- q43 (Q20 nested semi + agg): the IN becomes a left-semi join; the
  correlated HAVING aggregate decorrelates to a per-partkey total
  joined into the grouped supplier×part frame.  Supplier (the outer
  side) is dim-sized and stays broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_backend_spark.operators.queries import _register_standalone
from data_ingestion_backend_spark.plans.catalog import run_sql

# Q17 silhouette: lineitems below 20% of their part's average quantity.
# The inner avg is SUM(decimal)/COUNT — both engines cast the identical
# exact decimal to double, then evaluate the same IEEE division, so the
# 0.2·avg comparison boundary is bit-identical cross-engine.
Q41_SQL = """
SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS small_qty_revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#12'
  AND l.l_quantity < 0.2 * (
    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""

# Q2 silhouette: min-per-group join-back — each BUILDING customer's
# earliest order(s).  Equality join-back on an exact timestamp, raw
# parquet double passed through as the terminal (identical bits in both
# engines; no arithmetic, no rounding needed).
Q42_SQL = """
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       o.o_totalprice AS first_total
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate = (SELECT MIN(o2.o_orderdate) FROM orders o2
                       WHERE o2.o_custkey = c.c_custkey)
ORDER BY c.c_custkey, o.o_orderkey
"""

# Q20 silhouette: nested semi with a correlated aggregate — suppliers
# who shipped more than 3x the average per-supplier quantity of some
# PROMO part.  The correlated scalar lives inside the HAVING of the IN
# subquery (the deepest nesting Spark's decorrelation handles as one
# rewrite: semi-join + two aggregates + join-back).
Q43_SQL = """
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) >
         3.0 * (SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(DISTINCT l2.l_suppkey)
                FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey))
ORDER BY s.s_suppkey
"""


# --- global (uncorrelated) scalar subqueries — the OTHER subquery family.
# Correlated subqueries decorrelate into joins; these compile to a
# one-row broadcast reused across the outer plan (Spark executes the
# scalar subquery once and injects the literal — the plan shows a
# ReusedSubquery/Subquery node, which is CORRECT here, unlike the
# per-row correlated case the q41-q43 pins forbid).

# TPC-H Q11 silhouette: parts whose shipped value exceeds a fixed
# fraction of the GLOBAL total — group-HAVING against a global scalar.
Q44_SQL = """
SELECT l_partkey,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) >
       0.0006 * (SELECT CAST(SUM(CAST(l2.l_extendedprice AS DECIMAL(18,2)))
                             AS DOUBLE)
                 FROM lineitem l2)
ORDER BY part_value DESC, l_partkey
"""

# TPC-H Q15 silhouette: the supplier(s) achieving the maximum total
# revenue — a named view consumed twice (join + global MAX), the shape
# Spark must plan without recomputing the aggregate per consumer arm.
Q45_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS total_revenue
  FROM lineitem GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, ROUND(r.total_revenue, 2) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""

# TPC-H Q22 silhouette: above-average-balance customers with NO urgent
# orders — global scalar (positive-balance average) + NOT EXISTS
# anti-join, aggregated per nation.
Q46_SQL = """
SELECT c.c_nationkey, COUNT(*) AS numcust,
       ROUND(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2)))
                                 AS DOUBLE) / COUNT(*)
                     FROM customer c2 WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
"""


@_register_standalone("q41_correlated_avg_qty", Q41_SQL)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from below-avg-quantity lineitems of one brand."""
    return run_sql(spark, sf_dir, Q41_SQL)


@_register_standalone("q42_min_per_group_joinback", Q42_SQL)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: earliest order per customer via correlated MIN."""
    return run_sql(spark, sf_dir, Q42_SQL)


@_register_standalone("q43_nested_semi_agg", Q43_SQL)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: semi-join gated by a correlated HAVING aggregate."""
    return run_sql(spark, sf_dir, Q43_SQL)


@_register_standalone("q44_global_fraction_having", Q44_SQL)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against a global-total scalar subquery."""
    return run_sql(spark, sf_dir, Q44_SQL)


@_register_standalone("q45_max_over_view", Q45_SQL)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: view consumed by a join AND a global MAX scalar."""
    return run_sql(spark, sf_dir, Q45_SQL)


@_register_standalone("q46_antijoin_above_avg", Q46_SQL)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global-average scalar + NOT EXISTS anti-join."""
    return run_sql(spark, sf_dir, Q46_SQL)


# TPC-H Q9 silhouette: the 5-way star join (part ⋈ lineitem ⋈ supplier ⋈
# orders ⋈ nation) — the deepest join-reordering workout in the registry.
# No correlated subquery here; it lives in this module because it shares
# the SQL-text surface and the planner-exercise purpose.  Catalyst must
# (a) push the LIKE filter into the part scan and broadcast the filtered
# dim, (b) broadcast supplier and nation, (c) leave ONE fact-sized
# shuffle (lineitem ⋈ orders on the shared key feeding the final
# aggregate) — the q28/q29 discipline compounded across five tables.
# (The classic Q9 subtracts ps_supplycost; no partsupp table in the
# fixture star schema, so the measure is revenue only.)
#
# Terminal discipline: the revenue sum is an exact scale-4 decimal, and
# rounding it to 2 dp AFTER the double cast is the cross-engine midpoint
# hazard (a scale-4 value can sit exactly on a 2-dp midpoint — hit for
# real at sf0.1: 18266789.615 rounded .62 in Spark, .61 in DuckDB).
# Round in exact decimal FIRST, cast second; the outer double ROUND only
# collapses the 1-ulp cast noise and can't see a midpoint because the
# value is already on the 2-dp grid.
Q50_SQL = """
SELECT n.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       ROUND(CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l.l_discount AS DECIMAL(18,2))), 2) AS DOUBLE), 2)
         AS amount,
       COUNT(*) AS n_lines
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%bolt%'
GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
ORDER BY nation, o_year
"""


@_register_standalone("q50_profit_star_join", Q50_SQL)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: 5-way star join → per-nation/year revenue."""
    return run_sql(spark, sf_dir, Q50_SQL)


# LATERAL correlated subquery with LIMIT — "top-k related rows per
# entity" written the way an application developer writes it (the
# reference's nested issue payload builds exactly this shape in Python:
# per issue, the ordered affected rows — src/app/api/issues.py:83-106).
# Catalyst decorrelates the per-row LIMIT into a rank window over one
# join (plan-pinned: no per-customer re-execution), which is also why
# the oracle can't disagree: both engines reduce to the same windowed
# semantics over identical inputs; ties are broken by o_orderkey.
Q51_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM orders o WHERE o.o_custkey = c.c_custkey
  ORDER BY o.o_totalprice DESC, o.o_orderkey
  LIMIT 2
) t
WHERE c.c_mktsegment = 'MACHINERY' AND c.c_custkey < 200
ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
"""


@_register_standalone("q51_lateral_topk", Q51_SQL)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer via a correlated LATERAL LIMIT."""
    return run_sql(spark, sf_dir, Q51_SQL)


# WITH RECURSIVE — iterative SQL as ONE portable statement (Spark 4.1
# and DuckDB both execute it).  The recursion is a strict hierarchy
# derived from the key space (parent(k) = floor(k / 2): every custkey
# chains to the root through ~log2(n) ancestors), so the working set
# per level is |frontier|-bounded — no path explosion, deterministic
# depth, pure integer output.  This certifies the engine's recursive-
# CTE execution (frontier iteration under the hood — the same runtime
# shape as connected components / PageRank) with a uniform-gate oracle
# on the IDENTICAL text.  floor(x / 2.0) instead of integer division
# keeps one text portable (DuckDB // and Spark div are spelled
# differently); keys are positive so floor is exact.
Q52_SQL = """
WITH RECURSIVE anc (ck, node, depth) AS (
  SELECT c_custkey, c_custkey, 0
  FROM customer WHERE c_custkey < 512
  UNION ALL
  SELECT ck, CAST(floor(node / 2.0) AS BIGINT), depth + 1
  FROM anc WHERE node > 1
)
SELECT ck,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_ancestors,
       CAST(MAX(depth) AS BIGINT) AS chain_len,
       CAST(SUM(node) AS BIGINT) AS chain_sum
FROM anc
GROUP BY ck
ORDER BY ck
"""


@_register_standalone("q52_recursive_ancestors", Q52_SQL)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancestor chains via WITH RECURSIVE (identical text, both engines)."""
    return run_sql(spark, sf_dir, Q52_SQL)
