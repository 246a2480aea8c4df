"""Differential oracle: every registered query vs DuckDB at sf0.01.

This mirrors the driver's t2 gate so regressions surface locally first.
"""

from __future__ import annotations

import pytest

from data_ingestion_backend_spark.registry import ORACLE, QUERIES
from tests.conftest import SF_DIR_ORACLE
from tests.oracle_utils import compare_query, duckdb_connection


@pytest.fixture(scope="module")
def con():
    con = duckdb_connection(SF_DIR_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, con, name):
    df = QUERIES[name](spark, SF_DIR_ORACLE)
    compare_query(df, con, ORACLE[name])


def _standalone_registry():
    # importing the registry package populates both registries
    import data_ingestion_backend_spark.registry  # noqa: F401
    from data_ingestion_backend_spark.operators.queries import (
        STANDALONE_ORACLES,
        STANDALONE_QUERIES,
    )

    return STANDALONE_QUERIES, STANDALONE_ORACLES


@pytest.mark.parametrize("name", sorted(_standalone_registry()[1]))
def test_standalone_form_matches_oracle(spark, con, name):
    """Operators folded into consolidated driver certs keep their own
    local differential gate in the standalone form."""
    queries, oracles = _standalone_registry()
    compare_query(queries[name](spark, SF_DIR_ORACLE), con, oracles[name])


def test_every_query_has_entry():
    # Queries without oracle SQL are allowed (weaker rows-only check),
    # but every oracle must have a query.
    assert set(ORACLE) <= set(QUERIES)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
