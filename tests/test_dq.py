"""Data-quality expectations (operators/dq.py): planted-violation counts
and the one-scan-per-table plan contract.  The differential oracle for
the full report runs in test_oracle_queries.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR_SMALL
from data_ingestion_backend_spark.operators.dq import (
    conditional_expectations,
    dq_star_expectations,
    fk_expectation,
    unique_expectation,
)


def test_planted_violations_counted_exactly(spark):
    df = spark.createDataFrame(
        [(1, "O", 10.0), (2, None, -5.0), (3, "X", 0.0), (3, "F", 7.5)],
        "k long, status string, price double",
    )
    rows = {
        r["rule"]: r
        for r in conditional_expectations(
            df,
            "t",
            {
                "not_null:status": F.col("status").isNull(),
                "set:status": ~F.col("status").isin("O", "F", "P")
                & F.col("status").isNotNull(),
                "range:price>0": F.col("price") <= 0,
            },
        ).collect()
    }
    assert rows["not_null:status"]["n_violations"] == 1
    assert rows["set:status"]["n_violations"] == 1
    assert rows["range:price>0"]["n_violations"] == 2
    assert all(r["n_rows"] == 4 for r in rows.values())
    assert not any(r["passed"] for r in rows.values())

    uniq = unique_expectation(df, "t", "k").first()
    assert uniq["n_violations"] == 2  # both rows of the duplicated key

    parent = spark.createDataFrame([(1,), (2,)], "k long")
    fk = fk_expectation(df, "t", "k", parent, "k").first()
    assert fk["n_violations"] == 2  # the two k=3 orphans


def test_clean_fixture_passes_all_rules(spark):
    report = dq_star_expectations(spark, SF_DIR_SMALL).collect()
    assert len(report) == 7
    assert all(r["passed"] for r in report), [
        (r["rule"], r["n_violations"]) for r in report if not r["passed"]
    ]


def test_conditional_rules_share_one_scan(spark):
    """All predicate rules on a table must compile to ONE scan + ONE
    aggregate (the explode fans out the report rows, not the input)."""
    from data_ingestion_backend_spark.sources.fixtures import load_table

    orders = load_table(spark, SF_DIR_SMALL, "orders")
    df = conditional_expectations(
        orders,
        "orders",
        {
            "a": F.col("o_custkey").isNull(),
            "b": F.col("o_totalprice") <= 0,
            "c": ~F.col("o_orderstatus").isin("O", "F", "P"),
        },
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1, plan


def test_histogram_covers_all_rows_and_edges(spark):
    """Every row lands in exactly one bucket; min/max land in the first/
    last bucket (the +1-width construction's whole point)."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR_ORACLE
    from data_ingestion_backend_spark.operators.dq import (
        HIST_BUCKETS,
        dq_histogram_price,
    )
    from data_ingestion_backend_spark.sources.fixtures import load_table

    hist = dq_histogram_price(spark, SF_DIR_ORACLE).collect()
    li = load_table(spark, SF_DIR_ORACLE, "lineitem")
    n_rows = li.count()
    assert sum(r["n"] for r in hist) == n_rows
    buckets = [r["bucket"] for r in hist]
    assert min(buckets) == 0 and max(buckets) == HIST_BUCKETS - 1
    # edges are exact cents: the true max price sits inside the last bucket
    mx = li.agg(
        F.round(F.max("l_extendedprice") * 100, 0).cast("bigint")
    ).collect()[0][0]
    last = [r for r in hist if r["bucket"] == HIST_BUCKETS - 1][0]
    assert last["lo_cents"] <= mx <= last["hi_cents"]
