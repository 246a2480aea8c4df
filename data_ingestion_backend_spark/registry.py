"""Aggregated query/oracle registry across all operator modules.

``__spark_entry__.queries()`` / ``oracle_sql()`` read from here; each
operator module contributes its certified queries at import time.
"""

from __future__ import annotations

from data_ingestion_backend_spark.operators.queries import ORACLE, QUERIES
import data_ingestion_backend_spark.operators.text  # noqa: F401,E402 — registers
import data_ingestion_backend_spark.operators.dedup  # noqa: F401,E402 — registers
import data_ingestion_backend_spark.operators.similarity  # noqa: F401,E402 — registers
import data_ingestion_backend_spark.operators.multimodal  # noqa: F401,E402 — registers
import data_ingestion_backend_spark.operators.queries2  # noqa: F401,E402 — registers
import data_ingestion_backend_spark.operators.sketches  # noqa: F401,E402 — registers
import data_ingestion_backend_spark.operators.mlprep  # noqa: F401,E402 — registers
import data_ingestion_backend_spark.operators.scale  # noqa: F401,E402 — registers
import data_ingestion_backend_spark.operators.timeseries  # noqa: F401,E402 — registers (standalone)
import data_ingestion_backend_spark.operators.curate  # noqa: F401,E402 — registers (standalone)
import data_ingestion_backend_spark.operators.delta  # noqa: F401,E402 — registers (standalone)
import data_ingestion_backend_spark.operators.layout  # noqa: F401,E402 — registers (standalone)
import data_ingestion_backend_spark.operators.dq  # noqa: F401,E402 — registers (standalone)
import data_ingestion_backend_spark.operators.search  # noqa: F401,E402 — registers (standalone)
import data_ingestion_backend_spark.operators.subqueries  # noqa: F401,E402 — registers
import data_ingestion_backend_spark.operators.graph  # noqa: F401,E402 — registers (standalone)
import data_ingestion_backend_spark.operators.semantics  # noqa: F401,E402 — registers (standalone)
import data_ingestion_backend_spark.operators.fuzzy  # noqa: F401,E402 — registers (standalone)
import data_ingestion_backend_spark.operators.corpus  # noqa: F401,E402 — registers (the composed E2E build)
import data_ingestion_backend_spark.operators.corpus_incremental  # noqa: F401,E402 — registers (standalone: incremental ≡ monolithic)

__all__ = ["QUERIES", "ORACLE"]
