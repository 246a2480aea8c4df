"""Scalar functions of the engine (SURVEY §2.7 F1-F14).

Every helper returns a Catalyst ``Column`` built from
``pyspark.sql.functions`` — they all stay inside whole-stage codegen; none
drops to Python.  Reference behaviors they re-express:

- normalization ``lower(strip())`` — reference ``csv_validator.py:132-142``
- row idempotency hash — reference ``src/models/issue.py:81``
  (``staging_row_hash``, "only for idempotency")
- file-level sha256 — reference ``csv_validator.py:111``
- email validity (the INVALID_EMAIL issue type, ``src/models/issue.py:15``)
- S3-key sanitization — reference ``s3_service.py:48-52``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# One pinned email regex for the whole engine (INVALID_EMAIL detector).
# Local-part @ domain-with-a-dot; no whitespace, exactly one '@'.
EMAIL_REGEX = r"^[^@\s]+@[^@\s]+\.[^@\s]+$"


def norm_text(col: Column | str) -> Column:
    """lower(trim(x)) — the engine's canonical string normalization (F1)."""
    return F.lower(F.trim(F.col(col) if isinstance(col, str) else col))


def norm_header(name: str) -> str:
    """Driver-side header normalization: casefold + collapse whitespace/_/-.

    Mirrors the semantics of the reference's header matching
    (case/space-insensitive synonym lookup, ``csv_validator.py:132-165``)
    but runs on plain strings because headers are metadata, not data.
    Removes ALL whitespace (not just spaces) — embedded tabs/CRs from
    sloppy headers must not defeat the synonym lookup, and the function
    must be idempotent (hypothesis-tested).
    """
    return "".join(
        ch for ch in name.lower() if not ch.isspace() and ch not in "_-"
    )


def row_hash(*cols: Column | str, sep: str = "|") -> Column:
    """Content-derived idempotency hash (F4).

    ``md5(concat_ws('|', lower(trim(c1)), lower(trim(c2)), ...))`` — the
    Spark re-expression of ``staging_row_hash``.  NULLs are canonicalized to
    '' so the hash is total.  md5 matches DuckDB bit-for-bit, which keeps the
    hash oracle-checkable; at 100 TB the 128-bit space is still collision-safe
    for dedup purposes.
    """
    normed = [
        F.coalesce(norm_text(c), F.lit("")) for c in cols
    ]
    return F.md5(F.concat_ws(sep, *normed))


def contact_id_hash(user_id: int | Column, row_hash: Column | str) -> Column:
    """Owner-scoped contact identity: ``md5(user_id|staging_row_hash)``.

    Content alone is NOT the identity: two users ingesting byte-identical
    rows must each get their own contact (the reference scopes contacts per
    staging row via FK provenance, ``src/models/contact.py:11-29``; a
    content-only id silently drops the second user's contact at promotion
    and lets one user's cascade delete remove another's rows on content
    collision).  Scoping the hash by owner restores per-tenant isolation
    while keeping replay-safety: the id is still a pure function of
    (owner, content).
    """
    uid = F.lit(user_id) if isinstance(user_id, int) else user_id
    rh = F.col(row_hash) if isinstance(row_hash, str) else row_hash
    return F.md5(F.concat_ws("|", uid.cast("string"), rh))


def file_hash(content_col: Column | str) -> Column:
    """File-level sha256 over raw bytes/text (F3)."""
    col = F.col(content_col) if isinstance(content_col, str) else content_col
    return F.sha2(col, 256)


def is_valid_email(col: Column | str) -> Column:
    """Boolean email-validity predicate (F11) using the pinned regex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(c).rlike(EMAIL_REGEX)


def s3_safe_name(col: Column | str) -> Column:
    """Object-key sanitization (F5): spaces and '/' become '_'."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, " /", "__")
