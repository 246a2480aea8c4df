"""Warehouse crash-safety: a half-written version must be invisible."""

from __future__ import annotations

import os

from data_ingestion_backend_spark.sources.warehouse import Warehouse


def test_uncommitted_version_invisible(spark, tmp_path):
    """Simulate a crash between materializing v=N+1 and the pointer swap:
    readers must keep seeing v=N (snapshot isolation via atomic pointer)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(5).selectExpr(
        "cast(id as string) job_id", "id job_user_id", "'f' job_filename",
        "'PENDING' job_status", "0L job_total_rows", "0L job_processed_rows",
        "0L job_issue_count", "cast(null as string) job_error",
        "current_timestamp() job_created_at", "current_timestamp() job_updated_at",
    )
    wh.write("jobs", df)
    assert wh.read("jobs").count() == 5

    # crash simulation: v=1 directory appears, pointer never swaps
    bogus = os.path.join(str(tmp_path / "wh"), "jobs", "v=1")
    df.limit(1).write.parquet(bogus)
    assert wh.current_version("jobs") == 0
    assert wh.read("jobs").count() == 5  # still the committed snapshot

    # next successful write must not collide with the orphan dir
    wh.write("jobs", df.limit(2))
    assert wh.read("jobs").count() == 2


def test_per_table_write_parallelism(spark, tmp_path):
    """Data-plane tables (staging) must keep the plan's write parallelism;
    control-plane ledgers (jobs) coalesce to a bounded file count — an
    8-task ceiling on a multi-GB staging write would serialize the cluster."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    staging = (
        spark.range(20000)
        .repartition(24)
        .selectExpr(
            "cast(id as string) staging_id", "'j' staging_job_id", "id line_no",
            "'a@x.com' email", "'A' first_name", "'B' last_name", "'C' company",
            "'READY' staging_status", "cast(id as string) staging_row_hash",
        )
    )
    v = wh.write("staging", staging)
    files = [
        f
        for f in os.listdir(os.path.join(str(tmp_path / "wh"), "staging", f"v={v}"))
        if f.endswith(".parquet")
    ]
    assert len(files) > 8, f"staging write capped at {len(files)} files"
    # per-table override still honored
    wh2 = Warehouse(spark, str(tmp_path / "wh2"), write_partitions={"staging": 2})
    v2 = wh2.write("staging", staging)
    files2 = [
        f
        for f in os.listdir(os.path.join(str(tmp_path / "wh2"), "staging", f"v={v2}"))
        if f.endswith(".parquet")
    ]
    assert len(files2) <= 2


def test_time_travel_read(spark, tmp_path):
    """Retained versions stay readable (VERSION AS OF); vacuumed versions
    raise instead of silently reading a half-deleted directory."""
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(3).selectExpr(
        "cast(id as string) job_id", "id job_user_id", "'f' job_filename",
        "'PENDING' job_status", "0L job_total_rows", "0L job_processed_rows",
        "0L job_issue_count", "cast(null as string) job_error",
        "current_timestamp() job_created_at", "current_timestamp() job_updated_at",
    )
    wh.write("jobs", df)            # v=0
    wh.write("jobs", df.limit(1))   # v=1
    wh.write("jobs", df.limit(2))   # v=2
    assert wh.read("jobs").count() == 2
    assert wh.read("jobs", version=0).count() == 3
    assert wh.read("jobs", version=1).count() == 1

    wh.vacuum("jobs", keep=2)  # drops v=0
    with pytest.raises(FileNotFoundError):
        wh.read("jobs", version=0)
    assert wh.read("jobs", version=1).count() == 1  # still retained


def test_partitioned_write_prunes_at_planning_time(spark, tmp_path):
    """A filter on the hive-partition column must prune directories in
    the scan's PartitionFilters — and only files under the matching
    source=... directory may be touched at execution."""
    from pyspark.sql import functions as F

    wh = Warehouse(spark, str(tmp_path / "whp"))
    df = spark.createDataFrame(
        [(i, f"s{i % 3}", f"t{i}") for i in range(30)],
        "doc_id long, source string, text string",
    )
    wh.write("staging", df, partition_by=["source"])
    back = wh.read("staging")
    assert back.count() == 30

    filtered = back.where(F.col("source") == "s1")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "s1" in plan, plan
    touched = {
        r[0] for r in filtered.select(F.input_file_name()).distinct().collect()
    }
    assert touched and all("source=s1" in f for f in touched)
    assert filtered.count() == 10


def test_partitioned_snapshot_time_travel(spark, tmp_path):
    """Partitioned snapshots version and time-travel like flat ones."""
    wh = Warehouse(spark, str(tmp_path / "whp2"))
    v0_df = spark.createDataFrame(
        [(1, "a", "x")], "doc_id long, source string, text string"
    )
    v1_df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "doc_id long, source string, text string"
    )
    v0 = wh.write("staging", v0_df, partition_by=["source"])
    v1 = wh.write("staging", v1_df, partition_by=["source"])
    assert wh.read("staging", version=v0).count() == 1
    assert wh.read("staging", version=v1).count() == 2
    # partition column survives the round-trip in both versions
    assert set(wh.read("staging", version=v1).columns) == {
        "doc_id", "source", "text",
    }
