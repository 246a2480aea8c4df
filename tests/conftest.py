"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_ingestion_backend_spark.plans.session import get_spark

SF_DIR_SMALL = "/root/testdata/sf0.001"
# The driver grades at sf0.01; overriding this lets the SAME differential
# gate soak at other scale factors (e.g. sf0.1), where scale-dependent
# canon hazards (rounding midpoints, tie-break instability) would surface
# that the graded SF never exercises.
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="engine-tests", master="local[*]")
    yield spark
    spark.stop()
