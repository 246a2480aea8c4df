"""Aggregated query/oracle registry across all operator modules.

``__spark_entry__.queries()`` / ``oracle_sql()`` read from here; each
operator module contributes its certified queries at import time.
"""

from __future__ import annotations

from data_ingestion_backend_spark.operators.queries import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
