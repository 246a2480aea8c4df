"""Scalar expression helpers — all native Catalyst expressions (no UDFs)."""

from data_ingestion_backend_spark.functions.scalars import (  # noqa: F401
    EMAIL_REGEX,
    file_hash,
    is_valid_email,
    norm_header,
    norm_text,
    row_hash,
    s3_safe_name,
)
