"""Mutation operators M1-M3: partial updates and cascade delete.

Postgres mutates in place; a columnar lake rewrites snapshots.  Each
function here is a pure table→table transform committed through the
versioned warehouse, so replays are idempotent.

- M1 partial issue update (reference ``issue_repository.py:292-316``):
  only provided fields change; resolving sets ``resolved_at`` once (never
  overwrites an earlier resolution time); unresolving clears both
  ``resolved_at`` and ``resolved_by``; ``resolved_by`` defaults to the
  acting user.
- M2 partial staging update (reference ``staging_repository.py:106-120``):
  field patch + status validated against the enum domain.
- M3 cascade delete (reference FK ``ondelete=CASCADE``,
  ``src/models/issue.py:34,57-58,74`` + ``job_repository.py:202-226``):
  deleting a job anti-joins every child table; contacts follow through
  their provenance (``contact_id == md5(user_id|staging_row_hash)`` of the
  job's rows — owner-scoped, so cross-tenant content collisions never
  cascade).
  Children are rewritten before the parent so a crash leaves orphan-free
  state (delete gate re-checkable).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_backend_spark.models import JobStatus, StagingStatus
from data_ingestion_backend_spark.sources.warehouse import Warehouse


class NotDeletableError(ValueError):
    """Job status outside the deletable set (HTTP-400 analogue)."""


class NotFoundError(KeyError):
    """Unknown id / not owned by the acting user (HTTP-404 analogue)."""


def update_issue(
    wh: Warehouse,
    issue_id: str,
    acting_user: str,
    resolved: bool | None = None,
    resolved_by: str | None = None,
) -> None:
    """M1: partial update of one issue row."""
    issues = wh.read("issues")
    if not issues.filter(F.col("issue_id") == issue_id).take(1):
        raise NotFoundError(issue_id)
    hit = F.col("issue_id") == issue_id

    if resolved is not None:
        issues = issues.withColumn(
            "resolved_at",
            F.when(
                hit & F.lit(resolved),
                # set-once: keep an earlier resolution timestamp
                F.coalesce(F.col("resolved_at"), F.current_timestamp()),
            )
            .when(hit & ~F.lit(resolved), F.lit(None).cast("timestamp"))
            .otherwise(F.col("resolved_at")),
        ).withColumn(
            "resolved_by",
            F.when(
                hit & F.lit(resolved),
                F.coalesce(
                    F.lit(resolved_by), F.col("resolved_by"), F.lit(acting_user)
                ),
            )
            .when(hit & ~F.lit(resolved), F.lit(None).cast("string"))
            .otherwise(F.col("resolved_by")),
        ).withColumn(
            "issue_resolved",
            F.when(hit, F.lit(resolved)).otherwise(F.col("issue_resolved")),
        )
    elif resolved_by is not None:
        issues = issues.withColumn(
            "resolved_by",
            F.when(hit, F.lit(resolved_by)).otherwise(F.col("resolved_by")),
        )
    wh.write("issues", issues)


def update_staging(
    wh: Warehouse,
    staging_id: str,
    status: str | None = None,
    **fields: str,
) -> None:
    """M2: partial update of one staging row (status enum-validated)."""
    if status is not None and status not in StagingStatus.ALL:
        raise ValueError(f"invalid staging status: {status}")
    staging = wh.read("staging")
    if not staging.filter(F.col("staging_id") == staging_id).take(1):
        raise NotFoundError(staging_id)
    hit = F.col("staging_id") == staging_id
    if status is not None:
        staging = staging.withColumn(
            "staging_status",
            F.when(hit, F.lit(status)).otherwise(F.col("staging_status")),
        )
    for name, value in fields.items():
        if name not in {"email", "first_name", "last_name", "company"}:
            raise ValueError(f"not an updatable staging field: {name}")
        staging = staging.withColumn(
            name, F.when(hit, F.lit(value)).otherwise(F.col(name))
        )
    wh.write("staging", staging)


def delete_job(wh: Warehouse, job_id: str, user_id: int) -> None:
    """M3: gated cascade delete of one job and all derived rows."""
    jobs = wh.read("jobs")
    mine = jobs.filter(
        (F.col("job_id") == job_id) & (F.col("job_user_id") == user_id)
    ).take(1)
    if not mine:
        raise NotFoundError(job_id)
    if mine[0]["job_status"] not in JobStatus.DELETABLE:
        raise NotDeletableError(
            f"job {job_id} in status {mine[0]['job_status']} cannot be deleted"
        )

    doomed_staging = wh.read("staging").filter(F.col("staging_job_id") == job_id)
    # owner-scoped provenance (both contact-id generations, keyed by
    # (contact_id, contacts_user_id)): only THIS user's contacts can
    # match, so a content collision with another tenant's rows — current
    # or pre-upgrade legacy — never cascades there
    from data_ingestion_backend_spark.pipeline import _provenance_ids

    doomed_keys = _provenance_ids(doomed_staging, user_id)
    doomed_issues = wh.read("issues").filter(F.col("issues_job_id") == job_id).select(
        "issue_id"
    )

    # stage all five, publish once: the cascade is all-or-nothing to
    # readers, like the reference's single-transaction FK cascade
    # (job_repository.py:202-226).  A crash mid-stage publishes nothing
    # and the re-run converges (anti-joins are idempotent).
    wh.publish({
        "issue_items": wh.stage(
            "issue_items",
            wh.read("issue_items").join(doomed_issues, "issue_id", "left_anti"),
        ),
        "contacts": wh.stage(
            "contacts",
            wh.read("contacts").join(
                doomed_keys, ["contact_id", "contacts_user_id"], "left_anti"
            ),
        ),
        "issues": wh.stage(
            "issues", wh.read("issues").filter(F.col("issues_job_id") != job_id)
        ),
        "staging": wh.stage(
            "staging", wh.read("staging").filter(F.col("staging_job_id") != job_id)
        ),
        "jobs": wh.stage("jobs", wh.read("jobs").filter(F.col("job_id") != job_id)),
    })
