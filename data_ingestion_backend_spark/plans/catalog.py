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

import weakref

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_backend_spark.sources.fixtures import TABLES, load_table

#: last registration per session: (applicationId, sf_dir, source fingerprint).
#: Registration itself is lazy (no data read), but building each view's
#: DataFrame lists the parquet footer paths driver-side — ten listings per
#: call adds up in per-query loops (the bench runs each SQL-text query 6×),
#: so re-registration happens only when the session, directory, or the
#: directory's contents change.  Same fingerprint discipline as the dedup
#: persist memo: a rewritten source must never serve stale views.
#: KEYED BY THE LIVE SESSION OBJECT via ``weakref.WeakKeyDictionary``:
#: temp views are per-SparkSession while applicationId is per-JVM, so a
#: second session in the same app (``spark.newSession()``, parallel test
#: sessions) must not hit the first session's memo and skip registration
#: it never got.  A weak key (rather than ``id(spark)``) also rules out
#: the CPython address-reuse hazard — a new session allocated at a
#: collected session's address can never false-hit the memo, because the
#: collected session's entry died with it.
_REGISTERED: "weakref.WeakKeyDictionary[SparkSession, tuple[str, str]]" = (
    weakref.WeakKeyDictionary()
)


def register_fixture_views(spark: SparkSession, sf_dir: str) -> None:
    """(Re-)register the ten fixture tables as session temp views."""
    from data_ingestion_backend_spark.operators.dedup import _source_fingerprint

    state = (sf_dir, _source_fingerprint(sf_dir))
    if _REGISTERED.get(spark) == state:
        return
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _REGISTERED[spark] = state


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Run ANSI SQL text against the fixture tables at ``sf_dir``."""
    register_fixture_views(spark, sf_dir)
    return spark.sql(sql)
