"""JSONL (newline-delimited JSON) source/sink — the lingua franca of
LLM corpus interchange.

Reading goes through ``spark.read.text`` + ``from_json`` rather than
``spark.read.json`` for three production reasons:

1. **Quarantine, not poison**: one malformed line must neither fail the
   job (FAILFAST) nor silently vanish (DROPMALFORMED).  PERMISSIVE
   ``from_json`` with a corrupt-record column keeps the raw line, so the
   bad rows land in a quarantine frame with enough context to re-ingest
   after a fix — the same philosophy as the reference's CSV issue
   taxonomy (``src/services/csv_validator.py:84-265``: collect issues,
   never drop data on the floor).
2. **No schema-inference scan**: ``spark.read.json`` without a schema
   reads the corpus TWICE (one full pass just to infer).  At 100 TB the
   schema is a contract, not a discovery.
3. **The raw line stays addressable** for lineage (hashing, offsets)
   without re-serializing.

Writing serializes with ``to_json(struct(*))`` — field order = column
order, so output is deterministic and round-trips bit-stable.  Text
containing newlines is JSON-escaped, preserving the one-record-per-line
invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Raw-line column captured for quarantined records.
CORRUPT_COL = "_corrupt_record"


def _schema_with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL file against an explicit schema contract.

    Returns ``(good, quarantine)``:

    - ``good`` — rows parsed against ``schema``; fields missing from a
      line are null (schema drift tolerated), unknown fields ignored.
    - ``quarantine`` — unparseable lines as ``(_corrupt_record)``, raw
      and re-ingestable.

    Both frames derive from ONE pass over one shared scan; blank lines
    are dropped (a trailing newline is not a record).
    """
    full = _schema_with_corrupt(schema)
    parsed = (
        spark.read.text(path)
        .where(F.length(F.trim(F.col("value"))) > 0)
        .select(
            F.from_json(
                F.col("value"),
                full,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("r"),
            F.col("value"),
        )
    )
    bad_pred = F.col(f"r.{CORRUPT_COL}").isNotNull() | F.col("r").isNull()
    good = parsed.where(~bad_pred).select(
        *[F.col(f"r.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.where(bad_pred).select(
        F.col("value").alias(CORRUPT_COL)
    )
    return good, quarantine


def write_jsonl(df: DataFrame, path: str, partitions: int | None = None) -> None:
    """Serialize ``df`` as JSONL: one JSON object per line, fields in
    column order, nulls kept explicit (round-trip faithful)."""
    out = df.select(
        F.to_json(
            F.struct(*df.columns), {"ignoreNullFields": "false"}
        ).alias("value")
    )
    if partitions is not None:
        out = out.coalesce(partitions)
    out.write.mode("overwrite").text(path)
