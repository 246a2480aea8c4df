"""One-pass observed metrics (plans/metrics.py): values equal a separate
aggregation, and they ride an existing action (no second scan coded)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_backend_spark.plans.metrics import ingest_counters, observed


def test_observed_equals_separate_aggregation(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a@x.com"), (2, ""), (3, None), (4, "b@x.com"), (5, "a@x.com")],
        "id long, email string",
    )
    watched, obs = ingest_counters(df)
    # the metrics ride the WRITE action — no extra aggregation coded
    watched.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["n_rows"] == 5
    assert got["n_missing_email"] == 2
    assert 2 <= got["approx_emails"] <= 4  # HLL over {a@x.com, b@x.com, ""} variants


def test_observe_point_measures_pre_downstream_filter(spark, tmp_path):
    """Metrics see rows at the observed node: a downstream filter does
    not change them — observe where you want to measure."""
    df = spark.createDataFrame([(i,) for i in range(10)], "v long")
    watched, obs = observed(df, "pre", n=F.count(F.lit(1)))
    kept = watched.filter(F.col("v") % 2 == 0)
    assert kept.count() == 5
    assert obs.get["n"] == 10  # measured before the filter


def test_fresh_observation_per_action(spark):
    df = spark.createDataFrame([(1,), (2,)], "v long")
    w1, o1 = observed(df, "run1", n=F.count(F.lit(1)))
    w1.count()
    assert o1.get["n"] == 2
    # second run: new observation handle binds cleanly
    w2, o2 = observed(df.filter(F.col("v") > 1), "run2", n=F.count(F.lit(1)))
    w2.count()
    assert o2.get["n"] == 1
