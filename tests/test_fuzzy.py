"""Token-blocked fuzzy join: blocked result == naive quadratic truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR_ORACLE
from data_ingestion_backend_spark.operators.fuzzy import (
    FUZZY_MAX_DIST,
    fuzzy_self_join,
)
from data_ingestion_backend_spark.sources.fixtures import load_table


def test_blocked_matches_naive_quadratic(spark):
    """Completeness differential: the posting-join blocking must find
    every pair the all-pairs ground truth finds at the fixture's
    threshold (provable for K=1; empirically complete for K=2 here)."""
    names = load_table(spark, SF_DIR_ORACLE, "part").select("p_name").distinct()
    got = {
        (r["name_a"], r["name_b"], r["edit_dist"])
        for r in fuzzy_self_join(names, "p_name").collect()
    }
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    naive = (
        a.crossJoin(b)
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter(F.col("edit_dist") <= FUZZY_MAX_DIST)
    )
    want = {(r["name_a"], r["name_b"], r["edit_dist"]) for r in naive.collect()}
    assert got == want
    assert got, "no fuzzy pairs in fixture — test is vacuous"


def test_k1_pigeonhole_always_complete(spark):
    """K=1 contract: one edit touches one token, so any multi-token pair
    within distance 1 shares an unedited token — planted adversarial
    names included."""
    rows = [("alpha beta",), ("alpha betb",), ("alphx beta",), ("gamma delta",)]
    names = spark.createDataFrame(rows, "p_name string")
    got = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_self_join(names, "p_name", max_dist=1).collect()
    }
    assert got == {("alpha beta", "alpha betb"), ("alpha beta", "alphx beta")}
