"""Golden tests for the CSV intake + validation + curation pipeline.

Covers the non-SQL surface the DuckDB oracle can't certify: dialect
sniffing (S1/S2), header synonyms (P2), the four issue detectors, contact
promotion (J6), idempotent reprocess (St3), cascade delete (M3), and
partial updates (M1/M2).
"""

from __future__ import annotations

import os

import pytest

from data_ingestion_backend_spark.models import IssueType, JobStatus, StagingStatus
from data_ingestion_backend_spark.operators.mutations import (
    NotDeletableError,
    delete_job,
    update_issue,
    update_staging,
)
from data_ingestion_backend_spark.pipeline import (
    DuplicateFileError,
    ingest_file,
    reprocess_job,
)
from data_ingestion_backend_spark.sources.intake import (
    IntakeError,
    sniff_dialect,
)
from data_ingestion_backend_spark.sources.warehouse import Warehouse

USER = 7


def _write(tmp_path, name: str, text: str, encoding: str = "utf-8") -> str:
    p = tmp_path / name
    p.write_bytes(text.encode(encoding))
    return str(p)


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "warehouse"))


# --- dialect sniffing -------------------------------------------------------

def test_sniff_semicolon_latin1_portuguese_headers(tmp_path):
    path = _write(
        tmp_path,
        "br.csv",
        "E-Mail;Nome;Sobrenome;Empresa\njoão@ex.com;João;Sá;Açaí Ltda\n",
        encoding="latin-1",
    )
    d = sniff_dialect(path)
    assert d.delimiter == ";"
    assert d.encoding != "utf-8"  # latin-1 bytes must fall through the chain
    assert set(d.header_map.values()) == {"email", "first_name", "last_name", "company"}


def test_sniff_tab_and_comma(tmp_path):
    tab = _write(tmp_path, "t.csv", "email\tfirst_name\tlast_name\tcompany\na@b.co\tA\tB\tC\n")
    assert sniff_dialect(tab).delimiter == "\t"
    comma = _write(tmp_path, "c.csv", "email,first_name,last_name,company\na@b.co,A,B,C\n")
    assert sniff_dialect(comma).delimiter == ","


def test_sniff_rejects(tmp_path):
    with pytest.raises(IntakeError, match="csv"):
        sniff_dialect(_write(tmp_path, "x.txt", "email,first_name,last_name,company\n"))
    with pytest.raises(IntakeError, match="empty"):
        sniff_dialect(_write(tmp_path, "e.csv", "   \n"))
    with pytest.raises(IntakeError, match="header-only"):
        sniff_dialect(_write(tmp_path, "h.csv", "email,first_name,last_name,company\n"))
    with pytest.raises(IntakeError, match="missing required"):
        sniff_dialect(_write(tmp_path, "m.csv", "email,first_name,last_name\na@b.co,A,B\n"))


# --- happy path -------------------------------------------------------------

def test_size_cap_optional(tmp_path):
    """max_bytes mirrors the reference's 5MB reject (csv_validator.py:15);
    default is uncapped (Spark removes the single-process ceiling)."""
    path = _write(
        tmp_path, "big.csv",
        "email,first_name,last_name,company\n" + "a@x.com,A,B,C\n" * 100,
    )
    sniff_dialect(path)  # no cap: fine
    with pytest.raises(IntakeError, match="size cap"):
        sniff_dialect(path, max_bytes=64)


def test_split_parallel_ingest_line_numbers(spark, tmp_path):
    """A plain CSV (no quoted newlines) must read split-PARALLEL (multiple
    input splits, not the single-split multiLine path) and still number
    rows in exact file order across the splits."""
    from data_ingestion_backend_spark.sources.intake import read_csv

    n = 3000
    body = "email,first_name,last_name,company\n" + "".join(
        f"u{i}@x.com,F{i},L{i},C{i}\n" for i in range(n)
    )
    path = _write(tmp_path, "big_plain.csv", body)
    d = sniff_dialect(path)
    assert d.needs_multiline is False

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")  # force splits
    try:
        rows = read_csv(spark, path, d)
        import pyspark.sql.functions as SF

        n_parts = rows.select(SF.spark_partition_id()).distinct().count()
        assert n_parts > 1, "expected a multi-split scan"
        got = rows.select("line_no", "email").orderBy("line_no").collect()
        assert [r["line_no"] for r in got] == list(range(1, n + 1))
        # numbering matches file order, including across split boundaries
        assert [r["email"] for r in got] == [f"u{i}@x.com" for i in range(n)]
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_quoted_newline_file_detected_multiline(tmp_path):
    path = _write(
        tmp_path,
        "embedded.csv",
        'email,first_name,last_name,company\na@x.com,"A\nnn",Ames,Acme\n',
    )
    assert sniff_dialect(path).needs_multiline is True


def test_ingest_rfc4180_quoting(spark, wh, tmp_path):
    """Quoted fields may contain the delimiter, doubled quotes, and embedded
    newlines — stdlib csv.reader semantics (the reference's parser,
    csv_validator.py:276-281).  Spark side needs multiLine + escape='\"'."""
    import csv

    path = _write(
        tmp_path,
        "tricky.csv",
        "email,first_name,last_name,company\n"
        'a@x.com,"Smith, Jr.",Alpha,"Acme, Inc."\n'
        'c@x.com,"Multi\nLine",Gamma,GCo\n'
        'd@x.com,"Say ""hi""",Delta,DCo\n',
    )
    job_id = ingest_file(spark, wh, path, USER)
    job = wh.read("jobs").collect()[0]
    assert job["job_status"] == JobStatus.COMPLETED
    assert job["job_total_rows"] == 3  # the quoted newline is NOT a row break

    rows = sorted(wh.read("staging").collect(), key=lambda r: r["line_no"])
    with open(path, newline="") as fh:
        expect = list(csv.DictReader(fh))
    assert len(rows) == len(expect)
    for e, r in zip(expect, rows):
        assert (e["email"], e["first_name"], e["company"]) == (
            r["email"], r["first_name"], r["company"],
        )


def test_ingest_clean_file(spark, wh, tmp_path):
    path = _write(
        tmp_path,
        "clean.csv",
        "email,first_name,last_name,company\n"
        "a@x.com,Ann,Ames,Acme\n"
        "b@x.com,Bob,Bond,Bonn Inc\n",
    )
    job_id = ingest_file(spark, wh, path, USER)

    job = wh.read("jobs").collect()[0]
    assert job["job_status"] == JobStatus.COMPLETED
    assert job["job_total_rows"] == 2
    assert job["job_issue_count"] == 0

    staging = wh.read("staging").collect()
    assert {r["staging_status"] for r in staging} == {StagingStatus.SUCCESS}
    assert sorted(r["line_no"] for r in staging) == [1, 2]

    contacts = wh.read("contacts").collect()
    assert sorted(c["email"] for c in contacts) == ["a@x.com", "b@x.com"]
    assert all(c["contacts_user_id"] == USER for c in contacts)
    assert job_id == wh.read("jobs").collect()[0]["job_id"]


def test_duplicate_filename_rejected(spark, wh, tmp_path):
    path = _write(tmp_path, "dup.csv", "email,first_name,last_name,company\na@x.com,A,B,C\n")
    ingest_file(spark, wh, path, USER)
    with pytest.raises(DuplicateFileError):
        ingest_file(spark, wh, path, USER)


# --- issue matrix -----------------------------------------------------------

@pytest.fixture()
def messy_job(spark, wh, tmp_path):
    # pre-seed contacts with e@x.com via a first clean file
    seed = _write(tmp_path, "seed.csv", "email,first_name,last_name,company\ne@x.com,E,Eel,Eco\n")
    ingest_file(spark, wh, seed, USER)
    path = _write(
        tmp_path,
        "messy.csv",
        "email,first_name,last_name,company\n"
        "ok@x.com,Okay,Olsen,OkCo\n"          # 1 clean
        ",Missy,Mo,MoCo\n"                     # 2 missing email
        "bad-at.com,Bart,Bads,BadCo\n"         # 3 invalid email
        "dup@x.com,Dan,One,DupCo\n"            # 4 dup group winner
        "DUP@x.com ,Dan,Two,DupCo\n"           # 5 dup loser (case/space-insensitive)
        "e@x.com,Eve,Exists,ExCo\n"            # 6 existing email
        "nocmp@x.com,Nora,Cash,\n",            # 7 missing company
    )
    return ingest_file(spark, wh, path, USER)


def test_issue_matrix(spark, wh, messy_job):
    issues = [
        r
        for r in wh.read("issues").collect()
        if r["issues_job_id"] == messy_job
    ]
    by_type = {}
    for r in issues:
        by_type.setdefault(r["issue_type"], []).append(r)
    assert len(by_type[IssueType.MISSING_REQUIRED_FIELD]) == 2  # rows 2 & 7
    assert len(by_type[IssueType.INVALID_EMAIL]) == 1
    assert len(by_type[IssueType.DUPLICATE_EMAIL]) == 1         # one per email group
    assert len(by_type[IssueType.EXISTING_EMAIL]) == 1

    staging = {
        r["line_no"]: r["staging_status"]
        for r in wh.read("staging").collect()
        if r["staging_job_id"] == messy_job
    }
    assert staging == {
        1: StagingStatus.SUCCESS,
        2: StagingStatus.ISSUE,
        3: StagingStatus.ISSUE,
        4: StagingStatus.SUCCESS,  # dup winner survives
        5: StagingStatus.ISSUE,
        6: StagingStatus.ISSUE,
        7: StagingStatus.ISSUE,
    }

    # dup issue links the WHOLE group (both rows), keyed by normalized email
    dup_issue = by_type[IssueType.DUPLICATE_EMAIL][0]
    assert dup_issue["issue_key"] == "dup@x.com"
    items = wh.read("issue_items").filter(
        f"issue_id = '{dup_issue['issue_id']}'"
    ).count()
    assert items == 2

    # promoted: clean row + dup winner (existing e@x.com NOT re-promoted)
    contacts = [c["email"] for c in wh.read("contacts").collect()]
    assert sorted(contacts) == ["dup@x.com", "e@x.com", "ok@x.com"]

    job = wh.read("jobs").filter(f"job_id = '{messy_job}'").collect()[0]
    assert job["job_status"] == JobStatus.NEEDS_REVIEW
    assert job["job_issue_count"] == 5


# --- idempotency ------------------------------------------------------------

def _snapshot(wh):
    out = {}
    for t in ("jobs", "staging", "issues", "issue_items", "contacts"):
        drop_ts = [
            c
            for c in wh.read(t).columns
            if c.endswith("_at")  # wall-clock timestamps differ per run
        ]
        out[t] = sorted(
            tuple(r) for r in wh.read(t).drop(*drop_ts).collect()
        )
    return out


def test_reprocess_idempotent(spark, wh, tmp_path, messy_job):
    before = _snapshot(wh)
    # re-ingest the same content
    path = os.path.join(str(tmp_path), "messy.csv")
    reprocess_job(spark, wh, path, USER)
    after = _snapshot(wh)
    assert before == after


# --- mutations --------------------------------------------------------------

def test_update_issue_resolution_semantics(spark, wh, messy_job):
    iid = wh.read("issues").collect()[0]["issue_id"]
    update_issue(wh, iid, acting_user="alice", resolved=True)
    row = wh.read("issues").filter(f"issue_id = '{iid}'").collect()[0]
    assert row["issue_resolved"] and row["resolved_by"] == "alice"
    first_ts = row["resolved_at"]
    assert first_ts is not None

    # resolving again must keep the original timestamp (set-once)
    update_issue(wh, iid, acting_user="bob", resolved=True)
    row = wh.read("issues").filter(f"issue_id = '{iid}'").collect()[0]
    assert row["resolved_at"] == first_ts and row["resolved_by"] == "alice"

    # unresolve clears both
    update_issue(wh, iid, acting_user="bob", resolved=False)
    row = wh.read("issues").filter(f"issue_id = '{iid}'").collect()[0]
    assert not row["issue_resolved"]
    assert row["resolved_at"] is None and row["resolved_by"] is None


def test_update_staging_validates_enum(spark, wh, messy_job):
    sid = wh.read("staging").collect()[0]["staging_id"]
    update_staging(wh, sid, status=StagingStatus.DISCARD)
    assert (
        wh.read("staging").filter(f"staging_id = '{sid}'").collect()[0][
            "staging_status"
        ]
        == StagingStatus.DISCARD
    )
    with pytest.raises(ValueError, match="invalid staging status"):
        update_staging(wh, sid, status="NOT_A_STATUS")


def test_delete_job_cascade_no_orphans(spark, wh, messy_job):
    delete_job(wh, messy_job, USER)
    assert wh.read("jobs").filter(f"job_id = '{messy_job}'").count() == 0
    assert wh.read("staging").filter(f"staging_job_id = '{messy_job}'").count() == 0
    assert wh.read("issues").filter(f"issues_job_id = '{messy_job}'").count() == 0
    # no orphan issue_items: every remaining item joins to a live issue
    live = wh.read("issues").select("issue_id")
    orphans = wh.read("issue_items").join(live, "issue_id", "left_anti").count()
    assert orphans == 0
    # contacts promoted by the deleted job are gone; seed contact remains
    assert sorted(c["email"] for c in wh.read("contacts").collect()) == ["e@x.com"]


def test_cross_tenant_content_collision_isolated(spark, wh, tmp_path):
    """Two users ingest byte-identical content: both get their own contact
    (owner-scoped contact_id), and one user's cascade delete never removes
    the other's rows — the cross-tenant isolation contract."""
    body = "email,first_name,last_name,company\nz@x.com,Zed,Zulu,Zeta\nbad-row,,,\n"
    p1 = _write(tmp_path, "same_a.csv", body)
    p2 = _write(tmp_path, "same_b.csv", body)
    job_a = ingest_file(spark, wh, p1, 1)  # NEEDS_REVIEW (bad row) → deletable
    ingest_file(spark, wh, p2, 2)

    contacts = wh.read("contacts").collect()
    # identical content, two tenants → two distinct contacts, distinct ids
    assert sorted(c["contacts_user_id"] for c in contacts) == [1, 2]
    assert len({c["contact_id"] for c in contacts}) == 2

    delete_job(wh, job_a, 1)
    remaining = wh.read("contacts").collect()
    assert [c["contacts_user_id"] for c in remaining] == [2]
    assert remaining[0]["email"] == "z@x.com"


def test_legacy_contact_ids_still_reprocessable_and_deletable(spark, wh, tmp_path):
    """A warehouse written under the pre-scoping contact-id scheme
    (contact_id == bare staging_row_hash) must keep working after the
    upgrade: reprocess stays idempotent (no self-EXISTING_EMAIL) and
    cascade delete still removes the job's own legacy contacts — while a
    DIFFERENT tenant's legacy contact with identical content survives."""
    import pyspark.sql.functions as SF

    body = "email,first_name,last_name,company\nz@x.com,Zed,Zulu,Zeta\nbad-row,,,\n"
    path = _write(tmp_path, "legacy.csv", body)
    job_id = ingest_file(spark, wh, path, USER)

    # rewrite this user's contact to the LEGACY id form, and plant another
    # tenant's legacy contact with the SAME content hash
    staging_hash = (
        wh.read("staging")
        .filter(SF.col("staging_status") == StagingStatus.SUCCESS)
        .collect()[0]["staging_row_hash"]
    )
    legacy = wh.read("contacts").withColumn(
        "contact_id",
        SF.when(SF.col("contacts_user_id") == USER, SF.lit(staging_hash)).otherwise(
            SF.col("contact_id")
        ),
    )
    other = legacy.filter(SF.col("contacts_user_id") == USER).withColumn(
        "contacts_user_id", SF.lit(99).cast("long")
    )
    wh.write("contacts", legacy.unionByName(other))

    # reprocess: legacy own-promotion must be excluded → still idempotent
    reprocess_job(spark, wh, path, USER)
    statuses = {
        r["staging_status"]
        for r in wh.read("staging")
        .filter(SF.col("email") == "z@x.com")
        .collect()
    }
    assert StagingStatus.SUCCESS in statuses  # not self-flagged EXISTING_EMAIL

    # delete: this user's (legacy-id) contact goes; tenant 99's twin stays
    delete_job(wh, job_id, USER)
    remaining = wh.read("contacts").collect()
    assert [c["contacts_user_id"] for c in remaining] == [99]


def test_delete_completed_job_blocked(spark, wh, tmp_path):
    path = _write(tmp_path, "ok.csv", "email,first_name,last_name,company\nq@x.com,Q,W,E\n")
    job_id = ingest_file(spark, wh, path, USER)  # COMPLETED (no issues)
    with pytest.raises(NotDeletableError):
        delete_job(wh, job_id, USER)
