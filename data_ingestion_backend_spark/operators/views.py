"""API-view layer: the reference's read endpoints as DataFrame views.

Each function re-expresses one endpoint query (reference
``src/app/api/*.py`` + ``src/app/repository/*_repository.py``) as a
declarative plan.  API projections *exclude* internal columns
(``staging_row_hash``, ``issue_key`` — reference ``src/schemas/issue.py:
10-38`` "without staging_row_hash"); the nested ``affected_rows`` payload
is ``collect_list(struct(...))`` over the 3-way join (J3), which is the
single-plan replacement for the reference's eager-load + Python
projection loop (``issue_repository.py:55-66``, ``issues.py:77-106``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestion_backend_spark.sources.warehouse import Warehouse


def jobs_list(wh: Warehouse, user_id: int) -> DataFrame:
    """GET /jobs — newest first, ownership-scoped (O1 + P3)."""
    return (
        wh.read("jobs")
        .filter(F.col("job_user_id") == user_id)
        .orderBy(F.desc("job_created_at"), F.desc("job_id"))
    )


def issues_nested(wh: Warehouse, user_id: int) -> DataFrame:
    """GET /issues — nested affected_rows, internal columns dropped (J3/Q26).

    One declarative plan: issues ⋈ jobs (ownership) ⟕ issue_items ⟕ staging
    → group back to one row per issue with an array<struct> payload ordered
    by line_no.  jobs is the small side → broadcast.
    """
    jobs = wh.read("jobs").filter(F.col("job_user_id") == user_id).select(
        "job_id", "job_filename"
    )
    issues = wh.read("issues")
    items = wh.read("issue_items")
    staging = wh.read("staging").drop("staging_row_hash")  # API exclusion

    affected = (
        items.join(staging, "staging_id")
        .groupBy("issue_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "line_no",
                        "staging_id",
                        "email",
                        "first_name",
                        "last_name",
                        "company",
                        "staging_status",
                    )
                )
            ).alias("affected_rows")
        )
    )
    return (
        issues.join(F.broadcast(jobs), issues.issues_job_id == jobs.job_id)
        .join(affected, "issue_id", "left")
        .drop("issue_key", "job_id")  # API exclusion + join dup
        .orderBy(F.desc("issue_created_at"), F.desc("issue_id"))
    )


def issue_counts(wh: Warehouse, user_id: int) -> DataFrame:
    """GET /issues counts — one-pass conditional aggregation (A2/Q05).

    The reference issues two filtered COUNT queries and subtracts
    (``issue_repository.py:96-115``); one scan with conditional sums is the
    scale-correct form.
    """
    jobs = wh.read("jobs").filter(F.col("job_user_id") == user_id).select("job_id")
    resolved_flag = F.when(F.col("issue_resolved"), 1).otherwise(0)
    return (
        wh.read("issues")
        .join(F.broadcast(jobs), F.col("issues_job_id") == F.col("job_id"), "left_semi")
        .agg(
            F.count("*").alias("total"),
            F.coalesce(F.sum(resolved_flag), F.lit(0)).cast("bigint").alias("resolved"),
            F.coalesce(F.sum(1 - resolved_flag), F.lit(0)).cast("bigint").alias("unresolved"),
        )
    )


def contact_lookup(wh: Warehouse, user_id: int, email: str) -> DataFrame:
    """GET /contacts point lookup — conjunctive filter on the denormalized
    table; "no join needed" (J6, reference ``contact_repository.py:34-40``)."""
    return wh.read("contacts").filter(
        (F.col("contacts_user_id") == user_id)
        & (F.lower(F.trim(F.col("email"))) == email.strip().lower())
    )


def staging_view(wh: Warehouse, job_id: str) -> DataFrame:
    """GET /staging per job — internal hash excluded (P1)."""
    return (
        wh.read("staging")
        .filter(F.col("staging_job_id") == job_id)
        .drop("staging_row_hash")
        .orderBy("line_no")
    )
