"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``data_ingestion_backend_spark/``; this module is a
thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestion_backend_spark.plans.session import ENGINE_CONF
from data_ingestion_backend_spark.registry import ORACLE, QUERIES


def _ensure_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine configs to a driver-provided session."""
    for k, v in ENGINE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a running session — already-started JVM keeps its value
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, decimal-exact) on sf0.001."""
    _ensure_conf(spark)
    return QUERIES["q12_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_ensure_conf(spark), sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for each (SQL-expressible) query."""
    return dict(ORACLE)
