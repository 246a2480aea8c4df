"""data_ingestion_backend_spark — a PySpark-native analytics/ingestion engine.

A from-scratch re-expression of the capabilities of the reference system
``rpdevelops/data-ingestion-backend`` (a FastAPI CSV-ingestion control plane
over Postgres/S3/SQS) as an idiomatic Apache Spark engine:

- **sources/**   CSV intake (encoding/delimiter sniffing, header-synonym
  normalization) and parquet fixture loaders.
- **operators/** the relational query surface (scans, filters, joins,
  aggregations, windows, set ops) plus LLM-data-pipeline extension operators
  (dedup, similarity search, text analysis, multimodal plumbing).
- **functions/** scalar expression helpers (row hashes, email validation,
  normalization) — all native Catalyst expressions, no Python UDFs on the
  parity path.
- **plans/**     session factory, tuning configs, and plan-audit utilities.
- **streaming/** Structured Streaming landing-zone pipeline (the Spark
  re-expression of the reference's S3+SQS+worker hand-off).

Design rules (see SURVEY.md):
- DataFrame/SQL declarative plans; Catalyst/Tungsten pick physical strategy.
- Zero row-at-a-time Python UDFs; pandas_udf only where no native expr exists.
- Deterministic, oracle-checkable outputs: DECIMAL casts before sums,
  explicit aliases, tiebreak sorts.
- Every operator designed for 100 TB / 1000-executor scale: broadcast small
  dims, partial aggregation, partition pruning, no driver-side collects.
"""

__version__ = "0.1.0"

from data_ingestion_backend_spark.plans.session import get_spark  # noqa: F401
from data_ingestion_backend_spark.sources.fixtures import load_tables  # noqa: F401
