"""Integer PageRank: the bucketed-edges form must be bit-equal to the
broadcast form and must plan without an edge-side exchange — the
past-the-broadcast-threshold deployment shape, as code."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR_ORACLE, SF_DIR_SMALL
from data_ingestion_backend_spark.operators.graph import (
    pagerank,
    pagerank_bucketed,
    trade_edges,
)
from data_ingestion_backend_spark.plans.audit import formatted_plan


def _rank_map(df):
    return {r["node"]: r["r"] for r in df.collect()}


def test_bucketed_pagerank_equals_broadcast_form(spark, tmp_path):
    edges = trade_edges(spark, SF_DIR_ORACLE)
    want = _rank_map(pagerank(edges))
    got = _rank_map(
        pagerank_bucketed(
            spark,
            edges,
            table="pr_edges_eq_test",
            path=str(tmp_path / "pr_edges"),
        )
    )
    assert got == want, "bucketed iteration diverged from broadcast form"
    assert len(got) > 100, "fixture graph too small — test is vacuous"


def test_bucketed_pagerank_plan_never_shuffles_edges(spark, tmp_path):
    """The plan pin: with broadcast DISABLED (modelling ranks past the
    threshold), one iteration's inflow must read the bucketed edge scan
    directly — ``Bucketed: true``, and no Exchange keyed on the edge
    columns — while the broadcast-form twin over a plain parquet edge
    list pays an extra fact-side exchange."""
    edges = trade_edges(spark, SF_DIR_ORACLE)
    bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = pagerank_bucketed(
            spark,
            edges,
            iters=1,
            table="pr_edges_plan_test",
            path=str(tmp_path / "pr_edges_plan"),
        )
        plan = formatted_plan(df)
        assert "Bucketed: true" in plan, "edge scan lost its bucket layout"
        # the ONLY hash exchanges are the |nodes|-sized rank/inflow sides
        # (keys: node / dst); the fact-sized edge scan joins in place
        # (formatted mode prints the Exchange keys on an Arguments line)
        for line in plan.splitlines():
            if "hashpartitioning(src" in line:
                raise AssertionError(f"edge-side exchange survived: {line}")

        # the unbucketed twin (same data, plain parquet) must show the
        # edge-side exchange this form exists to remove
        plain_path = str(tmp_path / "pr_edges_plain")
        edges.join(
            edges.groupBy("src").agg(F.sum("w").alias("tw")), "src"
        ).write.mode("overwrite").parquet(plain_path)
        e = spark.read.parquet(plain_path)
        nodes = e.select(F.col("src").alias("node")).distinct()
        ranks = nodes.withColumn("r", F.lit(1).cast("bigint"))
        inflow = (
            e.join(ranks, e.src == ranks.node)
            .select(F.col("dst"), F.expr("(r * w) div tw").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        plain_plan = formatted_plan(inflow)
        assert "hashpartitioning(src" in plain_plan, (
            "twin lost its exchange — pin comparison is vacuous"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)


def test_triangle_counts_on_planted_graphs(spark):
    """K4 has 4 triangles with every node in 3; adding a pendant edge and
    a disjoint path (no triangles) changes nothing."""
    from data_ingestion_backend_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    extra = [(3, 10), (20, 21), (21, 22)]  # pendant + triangle-free path
    edges = spark.createDataFrame(k4 + extra, ["u", "v"])
    got = {r["node"]: r["n_tri"] for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_total_consistency(spark):
    """Registry form: every node's count ≤ total, Σ top-counts ≤ 3·total,
    and the riding total equals the independent recount."""
    from data_ingestion_backend_spark.operators.graph import graph_triangles

    rows = graph_triangles(spark, SF_DIR_SMALL).collect()
    assert len(rows) > 0
    total = rows[0]["total_triangles"]
    assert all(r["total_triangles"] == total for r in rows)
    assert all(0 < r["n_tri"] <= total for r in rows)
    # descending with id tie-break
    keys = [(-r["n_tri"], r["part"]) for r in rows]
    assert keys == sorted(keys)
