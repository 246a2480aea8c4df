"""Golden tests for data-layout operators (operators/layout.py).

The differential oracles run in test_oracle_queries.py; these pin what
the hash can't: the pruning benefit z-ordering exists to buy, the
physical write round-trip, and the compaction-plan packing guarantees.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF_DIR_ORACLE
from data_ingestion_backend_spark.operators.layout import (
    ZBITS,
    Z_BUCKET_BITS,
    _X,
    _Y_SPARK,
    layout_compaction_plan,
    layout_zorder_stats,
    zorder_key,
)
from data_ingestion_backend_spark.sources.fixtures import load_table


def _dims(spark):
    ev = load_table(spark, SF_DIR_ORACLE, "events")
    return ev.select(
        F.expr(_X).cast("bigint").alias("x"), F.expr(_Y_SPARK).alias("y")
    )


def _hit_fraction(bounds, lo, hi, dim):
    """Fraction of buckets whose [min,max] range intersects [lo,hi]."""
    hit = [
        b for b in bounds if not (b[f"{dim}_max"] < lo or b[f"{dim}_min"] > hi)
    ]
    return len(hit) / len(bounds)


def test_zorder_prunes_both_dimensions(spark):
    """The reason to z-order: per-file bounds stay narrow in BOTH
    dimensions, so single-dimension range predicates on EITHER column
    skip most files.  A linear x-sorted layout answers the same y-range
    query by touching every file."""
    dims = _dims(spark).cache()
    try:
        z_bounds = layout_zorder_stats(spark, SF_DIR_ORACLE).collect()

        # linear comparison layout: 64 buckets by x order (top 6 of 8 bits)
        lin_bounds = (
            dims.groupBy(F.shiftright("x", ZBITS - Z_BUCKET_BITS).alias("b"))
            .agg(
                F.min("y").alias("y_min"),
                F.max("y").alias("y_max"),
                F.min("x").alias("x_min"),
                F.max("x").alias("x_max"),
            )
            .collect()
        )

        # a y-selective query (one top-3-bit y class): linear layout reads
        # everything, z layout skips >= half the buckets by construction
        y_lin = _hit_fraction(lin_bounds, 96, 115, "y")
        y_z = _hit_fraction(z_bounds, 96, 115, "y")
        assert y_lin == 1.0
        assert y_z <= 0.5, f"z-layout y-pruning too weak: {y_z}"

        # an x-selective query: BOTH layouts must prune (z pays at most a
        # bounded factor vs the perfect linear layout)
        x_lin = _hit_fraction(lin_bounds, 32, 47, "x")
        x_z = _hit_fraction(z_bounds, 32, 47, "x")
        assert x_lin < 1.0
        assert x_z <= 0.5, f"z-layout x-pruning too weak: {x_z}"
    finally:
        dims.unpersist()


def test_zorder_write_roundtrip_bounds(spark, tmp_path):
    """The actual write path: range-partition by z, sort within
    partitions, write parquet — then every output file's (x,y) footer
    rectangle must cover only a fraction of the 2-D domain (that
    rectangle IS what a reader's min/max pruning consults)."""
    dims = _dims(spark)
    keyed = dims.withColumn("z", zorder_key(F.col("x"), F.col("y")))
    out = str(tmp_path / "zsorted")
    (
        keyed.repartitionByRange(8, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("x") - F.min("x")).alias("xr"),
            (F.max("y") - F.min("y")).alias("yr"),
        )
        .collect()
    )
    assert len(per_file) >= 4
    domain_area = 256 * 256
    # every file's rectangle bounded; mean area well under the domain
    areas = [(r["xr"] + 1) * (r["yr"] + 1) for r in per_file]
    assert max(areas) < domain_area
    assert sum(areas) / len(areas) < domain_area / 3


def test_compaction_bins_respect_target_bound(spark):
    """Greedy-pack guarantee per month: bin total < target + max file
    size; bins are date-contiguous; no file lost."""
    manifest = (
        load_table(spark, SF_DIR_ORACLE, "lineitem")
        .groupBy(
            F.date_trunc("month", F.col("l_shipdate")).alias("month"),
            F.date_trunc("day", F.col("l_shipdate")).alias("file_id"),
        )
        .agg(F.count("*").alias("size"))
    )
    stats = manifest.groupBy("month").agg(
        F.ceil(F.sum("size") / F.lit(4.0)).alias("target"),
        F.max("size").alias("max_size"),
        F.sum("size").alias("month_total"),
        F.count("*").alias("month_files"),
    )
    plan = layout_compaction_plan(spark, SF_DIR_ORACLE)
    joined = plan.join(stats, "month").collect()
    assert joined
    for r in joined:
        assert r["total_size"] < r["target"] + r["max_size"], r
    # conservation: per-month file and size totals survive binning
    per_month = {}
    for r in joined:
        agg = per_month.setdefault(r["month"], [0, 0])
        agg[0] += r["n_files"]
        agg[1] += r["total_size"]
    for r in stats.collect():
        assert per_month[r["month"]] == [r["month_files"], r["month_total"]]
    # contiguity: consecutive bins' [first_file, last_file] don't overlap
    by_month = {}
    for r in joined:
        by_month.setdefault(r["month"], []).append(r)
    for rows in by_month.values():
        rows.sort(key=lambda r: r["bin"])
        for a, b in zip(rows, rows[1:]):
            assert a["last_file"] < b["first_file"]


def test_compaction_window_is_partitioned(spark):
    """The packing window must be partitioned (by month) — an
    unpartitioned global window would serialize the manifest through one
    task at 100 TB."""
    plan = layout_compaction_plan(spark, SF_DIR_ORACLE)
    logical = plan._jdf.queryExecution().analyzed().toString()
    specs = [
        line for line in logical.splitlines() if "windowspecdefinition" in line
    ]
    assert specs, "no window in plan"
    for line in specs:
        assert "windowspecdefinition(month#" in line, line
