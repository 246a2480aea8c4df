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


def _planted_stop_token_corpus(spark):
    """~123 names all ending in the stop-token 'inc' (df = 100% ≫ the
    25% auto cap), with planted near-dup pairs whose ONLY shared token
    is the hot one — the exact shape that made the unguarded posting
    join quadratic and that the q-gram fallback must still find."""
    fillers = [f"{(i * 2654435761) % 2**32:08x} inc" for i in range(120)]
    planted = ["acme inc", "acmee inc", "blu ridge inc"]
    return spark.createDataFrame(
        [(n,) for n in fillers + planted], "p_name string"
    )


def test_planted_stop_token_guard_bounds_candidates(spark):
    """The hot-token df guard is CODE, not prose: on a stop-token corpus
    the candidate count stays far below the Σdf² blow-up (every pair
    shares 'inc', so unguarded candidates = all C(n,2) pairs), while the
    q-gram fallback keeps the planted hot-token-only pairs findable."""
    from data_ingestion_backend_spark.operators.fuzzy import _fuzzy_candidates

    names = _planted_stop_token_corpus(spark)
    n = names.count()
    all_pairs = n * (n - 1) // 2

    guarded = _fuzzy_candidates(names, "p_name").count()
    assert guarded < all_pairs / 4, (
        f"guard did not bound candidates: {guarded} of {all_pairs} pairs"
    )

    # ground truth: every pair shares the 'inc' token, so shared-token
    # semantics coincide with plain all-pairs edit distance here
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    naive = (
        a.crossJoin(b)
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter(F.col("edit_dist") <= FUZZY_MAX_DIST)
    )
    want = {(r["name_a"], r["name_b"], r["edit_dist"]) for r in naive.collect()}
    got = {
        (r["name_a"], r["name_b"], r["edit_dist"])
        for r in fuzzy_self_join(names, "p_name").collect()
    }
    assert got == want
    assert ("acme inc", "acmee inc", 1) in got, "planted hot-token pair lost"


def test_absolute_max_df_cap_still_finds_planted_pairs(spark):
    """The production form (absolute cap → linear candidate bound) keeps
    the same completeness contract on the planted corpus."""
    from data_ingestion_backend_spark.operators.fuzzy import _fuzzy_candidates

    names = _planted_stop_token_corpus(spark)
    got = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_self_join(names, "p_name", max_df=5).collect()
    }
    assert ("acme inc", "acmee inc") in got
    n = names.count()
    assert _fuzzy_candidates(names, "p_name", max_df=5).count() < n * (n - 1) // 8


def test_er_transitive_closure_planted(spark, tmp_path):
    """ER must merge A~B, B~C into ONE entity even when A and C are more
    than max_dist apart (transitivity through the cluster stage), and
    the canonical key must be the component-min key."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_ingestion_backend_spark.operators.fuzzy import er_canonical_parts

    rows = [
        (10, "amber linen rose"),      # A
        (20, "amber linen rosy"),      # B: dist 1 from A
        (30, "amber linen rosyx"),     # C: dist 1 from B, dist 2 from A
        (40, "cobalt steel frame"),    # isolated entity
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": [r[0] for r in rows],
                "p_name": [r[1] for r in rows],
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    out = {
        (r["name"], r["entity_id"], r["is_canonical"])
        for r in er_canonical_parts(spark, str(tmp_path)).collect()
    }
    assert out == {
        ("amber linen rose", 10, True),
        ("amber linen rosy", 10, False),
        ("amber linen rosyx", 10, False),
        ("cobalt steel frame", 40, True),
    }
