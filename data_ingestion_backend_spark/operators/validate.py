"""Row validation, issue detection, and contact curation (the worker).

The reference repo ships only the control plane; the row-processing
semantics live in its data model and are pinned there (issue taxonomy
``src/models/issue.py:12-17``, staging lifecycle ``:20-25``, contacts
``src/models/contact.py:11-29``).  This module is the Spark-native worker:
one pure function from (staging, contacts) to the full set of table deltas.

Pinned semantics (deterministic, order-independent):

1. **Row-level checks** (each staging row, independently):
   - ``MISSING_REQUIRED_FIELD`` — any canonical field NULL/blank (P7).
   - ``INVALID_EMAIL`` — email present but fails the pinned regex (F11).
   One issue per offending row; ``issue_key`` = the row's ``staging_id``.
2. **DUPLICATE_EMAIL** — among rows that passed row-level checks, the same
   normalized email appearing >1× within the job (A3).  The first
   occurrence by ``line_no`` stays eligible; later occurrences get status
   ISSUE.  One issue per offending email; ``issue_key`` = the normalized
   email; issue_items link *all* rows of the group (the reviewer needs the
   full group, matching the reference's M:N issue_items design).
3. **EXISTING_EMAIL** — remaining eligible rows whose normalized email is
   already in this user's contacts (J5 semi-join; ownership-scoped like
   reference ``contact_repository.py:76-80``).
4. **Promotion** — rows that survive all checks become SUCCESS and are
   promoted to ``contacts`` denormalized with the owning user id (J6);
   ``contact_id`` = ``md5(user_id|staging_row_hash)`` (owner-scoped AND
   content-derived → replay-safe without cross-tenant collisions; see
   ``functions.scalars.contact_id_hash``).

Issue ids are ``md5(job|type|key)`` — content-derived, so reprocessing a
job regenerates identical ids (St3 idempotency).

Scale: every step is a DataFrame transform — hash-aggs and joins keyed on
(job_id, email) — with no driver-side data movement.  The dup-window
partitions by (job, email): bounded groups, no skew beyond a single
pathological email within one job.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_ingestion_backend_spark.functions.scalars import (
    contact_id_hash,
    is_valid_email,
    norm_text,
)
from data_ingestion_backend_spark.models import (
    CANONICAL_COLUMNS,
    IssueType,
    StagingStatus,
)


@dataclass
class ValidationResult:
    staging: DataFrame      # staging rows with final status
    issues: DataFrame       # new issues
    issue_items: DataFrame  # issue ↔ staging links
    contacts: DataFrame     # newly promoted contacts (pre-append)


def _blank(col: str) -> F.Column:
    return F.col(col).isNull() | (F.length(F.trim(F.col(col))) == 0)


def _issue_id(issue_type: str, key_col) -> F.Column:
    return F.md5(
        F.concat_ws("|", F.col("staging_job_id"), F.lit(issue_type), key_col)
    )


def validate_staging(
    staging: DataFrame,
    contacts: DataFrame,
    user_id: int,
    now=None,
) -> ValidationResult:
    """Run the four detectors over one job's staging rows.

    ``staging``: READY rows of the job being processed (STAGING_SCHEMA).
    ``contacts``: the current curated table (for EXISTING_EMAIL).
    """
    now = now if now is not None else F.current_timestamp()
    email_n = norm_text("email")

    rows = staging.withColumn("_email_n", email_n)

    # 1. row-level detectors -------------------------------------------------
    missing_pred = None
    for c in CANONICAL_COLUMNS:
        p = _blank(c)
        missing_pred = p if missing_pred is None else (missing_pred | p)
    rows = rows.withColumn("_missing", missing_pred)
    rows = rows.withColumn(
        "_invalid", (~F.col("_missing")) & ~is_valid_email("email")
    )
    row_ok = ~(F.col("_missing") | F.col("_invalid"))

    # 2. in-job duplicate detection (among row-level-clean rows) -------------
    dup_w = Window.partitionBy("staging_job_id", "_email_n").orderBy("line_no")
    rows = rows.withColumn(
        "_dup_rank",
        F.when(row_ok, F.row_number().over(dup_w)).otherwise(F.lit(None)),
    )
    dup_cnt_w = Window.partitionBy("staging_job_id", "_email_n")
    rows = rows.withColumn(
        "_dup_group",
        row_ok
        & (
            F.sum(F.when(row_ok, 1).otherwise(0)).over(dup_cnt_w) > 1
        ),
    )
    rows = rows.withColumn("_dup_loser", F.col("_dup_group") & (F.col("_dup_rank") > 1))

    # 3. EXISTING_EMAIL (ownership-scoped semi-join against contacts) --------
    # No static broadcast hint: one user's contact set is usually small
    # but is NOT bounded by construction (a tenant can own the bulk of the
    # table), so the hint is AQE's call — it broadcasts when the runtime
    # size fits and falls back to a shuffle join when it does not.
    existing_emails = (
        contacts.filter(F.col("contacts_user_id") == F.lit(user_id))
        .select(norm_text("email").alias("_email_n"))
        .distinct()
    )
    rows = rows.join(
        existing_emails.withColumn("_exists", F.lit(True)),
        on="_email_n",
        how="left",
    ).withColumn(
        "_existing",
        row_ok & (~F.col("_dup_loser")) & F.coalesce(F.col("_exists"), F.lit(False)),
    )

    # final status -----------------------------------------------------------
    ok = row_ok & ~F.col("_dup_loser") & ~F.col("_existing")
    rows = rows.withColumn(
        "staging_status",
        F.when(ok, F.lit(StagingStatus.SUCCESS)).otherwise(F.lit(StagingStatus.ISSUE)),
    ).cache()

    # issues + items ---------------------------------------------------------
    def row_issue(flag_col: str, issue_type: str) -> tuple[DataFrame, DataFrame]:
        hit = rows.filter(F.col(flag_col))
        iss = hit.select(
            _issue_id(issue_type, F.col("staging_id")).alias("issue_id"),
            F.col("staging_job_id").alias("issues_job_id"),
            F.lit(issue_type).alias("issue_type"),
            F.col("staging_id").alias("issue_key"),
        )
        items = hit.select(
            _issue_id(issue_type, F.col("staging_id")).alias("issue_id"),
            "staging_id",
        )
        return iss, items

    def group_issue(flag_col: str, issue_type: str, member_col: str):
        # one issue per offending email; items = every row of the group
        keys = rows.filter(F.col(flag_col)).select(
            "staging_job_id", "_email_n"
        ).distinct()
        iss = keys.select(
            _issue_id(issue_type, F.col("_email_n")).alias("issue_id"),
            F.col("staging_job_id").alias("issues_job_id"),
            F.lit(issue_type).alias("issue_type"),
            F.col("_email_n").alias("issue_key"),
        )
        members = rows.filter(F.col(member_col)).select(
            _issue_id(issue_type, F.col("_email_n")).alias("issue_id"),
            "staging_id",
        )
        return iss, members

    m_iss, m_items = row_issue("_missing", IssueType.MISSING_REQUIRED_FIELD)
    i_iss, i_items = row_issue("_invalid", IssueType.INVALID_EMAIL)
    d_iss, d_items = group_issue("_dup_loser", IssueType.DUPLICATE_EMAIL, "_dup_group")
    e_iss, e_items = group_issue("_existing", IssueType.EXISTING_EMAIL, "_existing")

    issues = (
        m_iss.unionByName(i_iss)
        .unionByName(d_iss)
        .unionByName(e_iss)
        .withColumn("issue_resolved", F.lit(False))
        .withColumn("resolved_at", F.lit(None).cast("timestamp"))
        .withColumn("resolved_by", F.lit(None).cast("string"))
        .withColumn("issue_created_at", now)
    )
    issue_items = (
        m_items.unionByName(i_items).unionByName(d_items).unionByName(e_items)
    )

    # promotion --------------------------------------------------------------
    contacts_new = rows.filter(ok).select(
        contact_id_hash(user_id, "staging_row_hash").alias("contact_id"),
        F.lit(user_id).cast("long").alias("contacts_user_id"),
        "email",
        "first_name",
        "last_name",
        "company",
        now.alias("contact_created_at"),
    )

    staging_out = rows.select(
        "staging_id",
        "staging_job_id",
        "line_no",
        "email",
        "first_name",
        "last_name",
        "company",
        "staging_status",
        "staging_row_hash",
    )
    return ValidationResult(staging_out, issues, issue_items, contacts_new)
