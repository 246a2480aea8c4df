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
