"""Goldens for T = 0.5 temperature-scaled source mixing (prep_mix_temperature).

The cross-engine oracle runs in the standalone differential gate; these
pin the quota arithmetic on planted counts and the exact-isqrt weights.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.mlprep import (
    _isqrt_sql,
    mix_temperature,
)


def _docs(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "source"])


def test_quota_arithmetic_exact(spark):
    # counts 100/400/900 -> isqrt weights 10/20/30, W=60,
    # T = min(100*60/10, 400*60/20, 900*60/30) = 600,
    # quotas = 100/200/300: the binding (most-downsampled-relative)
    # source is kept fully, head sources are cut to the sqrt mix.
    out = (
        mix_temperature(_docs(spark, {"a": 100, "b": 400, "c": 900}))
        .groupBy("source")
        .agg(F.count("*").alias("kept"))
        .collect()
    )
    kept = {r["source"]: r["kept"] for r in out}
    assert kept == {"a": 100, "b": 200, "c": 300}


def test_uniform_corpus_is_noop(spark):
    out = mix_temperature(_docs(spark, {"a": 50, "b": 50, "c": 50}))
    assert out.count() == 150  # equal weights -> every doc kept


def test_rare_source_upsampled_relatively(spark):
    # 1:100 raw ratio becomes 1:10 after T=0.5 (sqrt)
    kept = {
        r["source"]: r["kept"]
        for r in mix_temperature(_docs(spark, {"rare": 16, "head": 1600}))
        .groupBy("source")
        .agg(F.count("*").alias("kept"))
        .collect()
    }
    assert kept["rare"] == 16            # binding source fully kept
    assert kept["head"] == 160           # head cut to 10x rare, not 100x


def test_isqrt_expression_matches_math_isqrt(spark):
    import math

    vals = [0, 1, 2, 3, 4, 99, 100, 101, 2**40, 999999999999999999]
    df = spark.createDataFrame([(v,) for v in vals], ["n"]).select(
        "n", F.expr(_isqrt_sql("n")).alias("isq")
    )
    for r in df.collect():
        assert r["isq"] == math.isqrt(r["n"]), r
