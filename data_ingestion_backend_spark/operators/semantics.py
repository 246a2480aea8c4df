"""SQL-semantics completeness certs: nulls, unpivot, bounded frames.

Small, cheap certs for the semantic corners where engines genuinely
disagree and silent wrongness hides — each runs the IDENTICAL portable
SQL text on Spark (via ``plans/catalog.run_sql``) and DuckDB:

- **q47 null semantics**: NULL join keys must not match under ``=``
  (inner join drops them) but MUST match under null-safe equality
  (``IS NOT DISTINCT FROM``); ``COUNT(col)`` skips nulls while
  ``COUNT(*)`` does not; ``COUNT(DISTINCT col)`` excludes the null
  group.  One row of five counters pins all of it — the reference's
  validators live on exactly these rules (MISSING_REQUIRED_FIELD,
  DUPLICATE_EMAIL treat empty/null as absent, reference
  ``src/services/csv_validator.py:84-265``).
- **q48 unpivot**: wide→long is the inverse of the certified pivot
  (q34) and was the one reshaping direction without a cert.  Spark and
  DuckDB both parse the standard UNPIVOT clause; values are BIGINT
  counters, so the hash match is exact.
- **q49 bounded window frame**: ``ROWS BETWEEN 6 PRECEDING AND CURRENT
  ROW`` — the moving-window frame shape between q19's unbounded running
  frame and q36's RANGE frame.  The ORDER BY is made total
  (shipdate, orderkey, linenumber) because a ROWS frame over a
  non-total order has engine-dependent frame contents; the moving SUM
  stays exact decimal inside the frame and the terminal follows the
  repo's round-then-cast discipline.  No division in the output — the
  frame COUNT rides along instead, so there is no float terminal at
  all.

Scale shapes: q47 is dim-sized; q48 unpivots a 5-row aggregate (Expand
over the aggregate, never the fact — same rule as the rollup/cube
two-phase); q49 is one hash partition shuffle on l_partkey with an
in-partition sort, the standard window plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_backend_spark.operators.queries import _register_standalone
from data_ingestion_backend_spark.plans.catalog import run_sql

Q47_SQL = """
WITH t AS (SELECT n_nationkey, NULLIF(n_regionkey, 0) AS k FROM nation)
SELECT
  (SELECT COUNT(*) FROM t) AS n_rows,
  (SELECT COUNT(k) FROM t) AS n_nonnull,
  (SELECT COUNT(DISTINCT k) FROM t) AS n_distinct_nonnull,
  (SELECT COUNT(*) FROM t a JOIN t b ON a.k = b.k) AS n_eq_join,
  (SELECT COUNT(*) FROM t a JOIN t b ON a.k IS NOT DISTINCT FROM b.k)
    AS n_nullsafe_join
"""

Q48_SQL = """
SELECT o_orderpriority, metric, CAST(val AS BIGINT) AS val
FROM (
  SELECT o_orderpriority,
         COUNT(*) AS n_orders,
         COUNT(DISTINCT o_custkey) AS n_custs
  FROM orders GROUP BY o_orderpriority
) UNPIVOT (val FOR metric IN (n_orders, n_custs))
ORDER BY o_orderpriority, metric
"""

Q49_SQL = """
SELECT l_orderkey, l_linenumber,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE), 2)
         AS mov_sum,
       COUNT(*) OVER w AS n_window
FROM lineitem
WHERE l_partkey % 50 = 0
WINDOW w AS (PARTITION BY l_partkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY l_orderkey, l_linenumber
"""


@_register_standalone("q47_null_semantics", Q47_SQL)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null join/count/distinct semantics pinned in one row."""
    return run_sql(spark, sf_dir, Q47_SQL)


@_register_standalone("q48_unpivot", Q48_SQL)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long), the inverse of the certified q34 pivot."""
    return run_sql(spark, sf_dir, Q48_SQL)


@_register_standalone("q49_moving_frame", Q49_SQL)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-bounded moving frame over a total per-partition order."""
    return run_sql(spark, sf_dir, Q49_SQL)
