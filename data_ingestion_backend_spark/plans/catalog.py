"""SQL-facing entry surface: fixture tables as temp views + ``run_sql``.

The reference's public surface IS a query surface — its API endpoints
compile straight to SQL over the same tables (reference
``src/app/api/jobs.py:74-90``, ``src/app/api/issues.py:39-106``); the
Python builders in ``operators/`` are this engine's equivalent, but an
analytics user's first instinct is to hand the engine SQL TEXT.  This
module closes that gap: every fixture table registers as a temp view
(through :func:`~data_ingestion_backend_spark.sources.fixtures.load_table`,
so SQL callers inherit the same physical-type normalization — nanos/NTZ
event timestamps arrive as clean TimestampType in SQL too), and
``run_sql`` is the one-call text path.

Catalyst treats a parsed SQL tree and a DataFrame builder tree
identically from analysis onward — same optimizer rules, same physical
strategies — so the SQL path needs no separate performance story;
``tests/test_sql_surface.py`` pins text-vs-builder result equality on
certified queries and plan equality on their optimized forms.

At cluster scale the temp-view registration is replaced by a real
metastore catalog (the views here are session-scoped by design); nothing
about the query texts changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_backend_spark.sources.fixtures import TABLES, load_table


def register_fixture_views(spark: SparkSession, sf_dir: str) -> None:
    """(Re-)register the ten fixture tables as session temp views.

    ``createOrReplaceTempView`` is a catalog-pointer swap (no data is
    read), so re-registering per call is free and makes the view set
    track ``sf_dir`` — two successive calls at different scale factors
    never leak stale views into each other's queries.
    """
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Run ANSI SQL text against the fixture tables at ``sf_dir``."""
    register_fixture_views(spark, sf_dir)
    return spark.sql(sql)
