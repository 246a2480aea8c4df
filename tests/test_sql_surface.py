"""SQL text surface (plans/catalog.py) + correlated-subquery decorrelation.

Two contracts:

1. **Text ≡ builder.**  The engine's certified queries produce identical
   results whether expressed as a DataFrame builder chain or as SQL text
   through ``run_sql`` — the oracle texts are written in the portable
   ANSI subset, so they double as the Spark SQL input.  This is the
   reference's actual user surface (its API endpoints are query
   surfaces, reference ``src/app/api/issues.py:39-106``).

2. **Decorrelation.**  The q41/q42/q43 correlated scalar subqueries must
   compile to one aggregation + join-back, never a per-outer-row
   subquery re-execution — the plan contains HashAggregate/join nodes
   and NO scalar-subquery execution node.  Losing decorrelation is the
   O(n²) cliff at 100 TB even though results stay correct.
"""

from __future__ import annotations

import pytest

from data_ingestion_backend_spark.operators.queries import STANDALONE_QUERIES
from data_ingestion_backend_spark.operators.subqueries import (
    Q41_SQL,
    Q42_SQL,
    Q43_SQL,
    Q44_SQL,
    Q45_SQL,
    Q46_SQL,
    Q50_SQL,
)
from data_ingestion_backend_spark.plans.audit import formatted_plan
from data_ingestion_backend_spark.plans.catalog import register_fixture_views, run_sql
from data_ingestion_backend_spark.plans.sqltext import (
    NON_EXPRESSIBLE,
    SPARK_TEXT,
    spark_sql_text,
)
from data_ingestion_backend_spark.registry import ORACLE, QUERIES
from tests.conftest import SF_DIR_ORACLE

# the text surface covers EVERY graded cert except the enumerated
# non-expressible remainder (plans/sqltext.py documents each reason):
# portable oracle texts run verbatim, the rest through their Spark
# dialect twin
TEXT_EQ_QUERIES = sorted(set(ORACLE) - set(NON_EXPRESSIBLE))


def _canon(df):
    # stringified values: NULLs (left-join misses) sort fine, and
    # same-engine comparison needs no numeric tolerance
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_fixture_views_register(spark):
    register_fixture_views(spark, SF_DIR_ORACLE)
    n = spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
    assert n > 0
    # events arrives type-normalized through the view too (the nanos/NTZ
    # shim lives in load_table, which the registration funnels through)
    [t] = spark.sql("SELECT ts FROM events LIMIT 1").dtypes
    assert t[1] == "timestamp"


def test_second_session_in_same_app_gets_views(spark):
    """Temp views are per-SparkSession, not per-application: a sibling
    session created with ``newSession()`` shares the applicationId but
    none of the views — the registration memo must be keyed by session
    identity, or the sibling hits the first session's memo and
    ``run_sql`` fails with TABLE_OR_VIEW_NOT_FOUND."""
    register_fixture_views(spark, SF_DIR_ORACLE)  # prime the memo
    sibling = spark.newSession()
    try:
        n = run_sql(
            sibling, SF_DIR_ORACLE, "SELECT COUNT(*) AS n FROM lineitem"
        ).collect()[0]["n"]
        assert n > 0
    finally:
        # drop the sibling's views so it can be GC'd cleanly
        for t in ("lineitem",):
            sibling.catalog.dropTempView(t)


def test_text_surface_partition_is_exhaustive():
    """Every graded cert is either text-covered or enumerated
    non-expressible — no silent third bucket; and the dialect-twin /
    non-expressible sets never overlap or go stale."""
    assert set(TEXT_EQ_QUERIES) | set(NON_EXPRESSIBLE) == set(ORACLE)
    assert not set(NON_EXPRESSIBLE) & set(SPARK_TEXT)
    assert set(SPARK_TEXT) <= set(ORACLE)
    assert len(TEXT_EQ_QUERIES) >= 40


@pytest.mark.parametrize("name", TEXT_EQ_QUERIES)
def test_sql_text_equals_builder(spark, name):
    got_sql = run_sql(spark, SF_DIR_ORACLE, spark_sql_text(name))
    got_builder = QUERIES[name](spark, SF_DIR_ORACLE)
    assert sorted(got_sql.columns) == sorted(got_builder.columns)
    assert _canon(got_sql) == _canon(got_builder)


# ---------------------------------------------------------------------------
# decorrelation plan pins
# ---------------------------------------------------------------------------


def _assert_decorrelated(plan: str):
    # a decorrelated plan is pure joins+aggregates; a surviving scalar
    # subquery shows up as a Subquery/ScalarSubquery execution node that
    # would re-run per outer row (or once per reuse — either way it is
    # the shape we forbid)
    assert "Subquery" not in plan, "correlated subquery was not decorrelated"
    assert "HashAggregate" in plan


def test_q41_decorrelates_to_one_aggregate_joined_back(spark):
    df = run_sql(spark, SF_DIR_ORACLE, Q41_SQL)
    plan = formatted_plan(df)
    _assert_decorrelated(plan)
    # the per-partkey average joins back via broadcast (agg output is
    # |parts|-sized, far under the threshold) — not a fact-fact shuffle
    assert "BroadcastHashJoin" in plan


def test_q42_decorrelates_min_per_group(spark):
    df = run_sql(spark, SF_DIR_ORACLE, Q42_SQL)
    plan = formatted_plan(df)
    _assert_decorrelated(plan)


def test_q43_nested_semi_decorrelates(spark):
    df = run_sql(spark, SF_DIR_ORACLE, Q43_SQL)
    plan = formatted_plan(df)
    _assert_decorrelated(plan)
    # the IN gate must stay a semi-join
    assert "Semi" in plan


def test_global_scalar_subqueries_execute_once(spark):
    """q44-q46's UNCORRELATED scalars are the one place a Subquery node
    is correct: the scalar runs once as its own stage and its literal is
    injected into the outer plan — per-row re-execution is impossible by
    construction.  The outer plans stay normal aggregates/joins, and
    q46's NOT EXISTS compiles to an anti-JOIN, never a per-row probe."""
    for sql_text in (Q44_SQL, Q45_SQL):
        plan = formatted_plan(run_sql(spark, SF_DIR_ORACLE, sql_text))
        assert "Subquery" in plan  # the once-executed scalar stage
        assert "HashAggregate" in plan
    plan46 = formatted_plan(run_sql(spark, SF_DIR_ORACLE, Q46_SQL))
    assert "Subquery" in plan46
    assert "Anti" in plan46


def test_correlated_queries_match_row_shapes(spark):
    # cheap structural smoke at the graded SF (full value certs run in
    # the differential gate): single-row scalar for q41, non-empty
    # join-backs for q42/q43
    assert STANDALONE_QUERIES["q41_correlated_avg_qty"](spark, SF_DIR_ORACLE).count() == 1
    assert STANDALONE_QUERIES["q42_min_per_group_joinback"](spark, SF_DIR_ORACLE).count() > 0
    n_sup = STANDALONE_QUERIES["q43_nested_semi_agg"](spark, SF_DIR_ORACLE).count()
    assert 0 < n_sup < 100, "q43 threshold must stay selective"


def test_q50_star_join_broadcasts_dims_no_sortmerge(spark):
    """The 5-way star join must resolve every dim side to a broadcast
    hash join (no sort-merge anywhere at this scale) and stay clean
    under the preflight auditor."""
    from data_ingestion_backend_spark.plans.audit import preflight

    df = run_sql(spark, SF_DIR_ORACLE, Q50_SQL)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert preflight(df) == []


def test_q51_lateral_limit_becomes_window(spark):
    """The correlated LATERAL ... LIMIT must decorrelate into a rank
    window over one join — never a per-outer-row subquery execution."""
    from data_ingestion_backend_spark.operators.subqueries import Q51_SQL

    plan = formatted_plan(run_sql(spark, SF_DIR_ORACLE, Q51_SQL))
    assert "Window" in plan
    assert "Subquery" not in plan
