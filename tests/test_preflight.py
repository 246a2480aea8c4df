"""Preflight plan audit (plans/audit.preflight): every anti-pattern code
fires on a planted example and stays quiet on certified scale-shaped
queries."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from conftest import SF_DIR_ORACLE
from data_ingestion_backend_spark.plans.audit import preflight
from data_ingestion_backend_spark.registry import QUERIES
from data_ingestion_backend_spark.sources.fixtures import load_table


def _codes(df, **kw):
    return {f["code"] for f in preflight(df, **kw)}


def test_cartesian_fires(spark):
    a = load_table(spark, SF_DIR_ORACLE, "nation")
    b = load_table(spark, SF_DIR_ORACLE, "region")
    assert "CARTESIAN" in _codes(a.crossJoin(b))


def test_python_udf_fires(spark):
    from pyspark.sql.functions import udf

    bad = udf(lambda s: s.upper(), T.StringType())
    df = load_table(spark, SF_DIR_ORACLE, "nation").select(bad("n_name"))
    assert "PYTHON_UDF" in _codes(df)


def test_unpushed_scan_fires(spark):
    # an opaque-to-pushdown predicate: filter survives above the scan,
    # pushed-filter list stays empty
    df = load_table(spark, SF_DIR_ORACLE, "orders").filter(
        F.md5(F.col("o_orderstatus").cast("string")).startswith("a")
    )
    assert "UNPUSHED_SCAN" in _codes(df)


def test_wide_scan_fires(spark):
    df = load_table(spark, SF_DIR_ORACLE, "lineitem")  # 11 columns
    assert "WIDE_SCAN" in _codes(df, wide_cols=6)


def test_fact_sortmerge_fires(spark):
    li = load_table(spark, SF_DIR_ORACLE, "lineitem").hint("merge")
    o = load_table(spark, SF_DIR_ORACLE, "orders").hint("merge")
    df = li.join(o, li.l_orderkey == o.o_orderkey)
    assert "FACT_SORTMERGE" in _codes(df)


def test_certified_queries_are_clean(spark):
    """The graded TPC-H-shaped certs must not trip the auditor — they ARE
    the scale-shaped reference plans.  (Extension operators with pandas
    stages legitimately show Arrow exchanges and are out of scope here.)"""
    for name in [
        "q12_pricing_summary",
        "q28_shipping_priority",
        "q29_regional_revenue",
        "q09_left_join_count",
    ]:
        codes = _codes(QUERIES[name](spark, SF_DIR_ORACLE))
        assert not codes, f"{name} tripped {codes}"
