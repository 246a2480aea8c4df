"""Schema evolution: read heterogeneous parquet generations as ONE table.

A long-lived ingestion pipeline never has one schema — columns get
added, retired, and widened across producer releases, and the at-rest
corpus is a mix of every generation that ever wrote.  The reference
sidesteps this with header-synonym renames at CSV intake (reference
``src/services/csv_validator.py:84-140``); a columnar lake needs the
same idea at the FILE level:

- ``read_evolving``: one scan over N parquet generations with
  ``mergeSchema`` (per-file footers are reconciled into the union
  schema — rows from files that lack a column read NULL there), then
  conformed to the declared TARGET schema.
- ``conform``: project any frame onto a target schema — missing
  columns materialize as typed NULLs, extra columns are dropped,
  compatible types are cast (the widenings parquet merge itself
  refuses, e.g. int→bigint across files, are handled here by casting
  AFTER the union read of each generation).

The target schema is a CONTRACT the caller declares, never inferred
from whatever files happen to be present — the same "schema is a
contract, not a discovery" stance as the JSONL source.  Casts are
nullable-safe and deterministic; a column whose cast is not possible
fails analysis loudly rather than silently nulling (Spark ANSI cast
semantics under the session config).

Scale: ``mergeSchema`` reads FOOTERS of every file at planning time —
cheap but not free at millions of files; production layouts version
the schema in the table metadata (Delta/Iceberg) and this module is
the migration shim for plain-parquet corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def conform(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` onto ``target``: add missing columns as typed
    NULLs, drop extras, cast type drift to the declared type."""
    cols = []
    have = {f.name: f for f in df.schema.fields}
    for field in target.fields:
        if field.name in have:
            src = have[field.name]
            col = F.col(field.name)
            if src.dataType != field.dataType:
                col = col.cast(field.dataType)
            cols.append(col.alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def read_evolving(
    spark: SparkSession, paths: list[str], target: T.StructType
) -> DataFrame:
    """Read N parquet generations as one conformed frame.

    Generations whose physical types drifted (int→bigint) are read
    separately and conformed BEFORE the union — parquet ``mergeSchema``
    refuses cross-file type changes, so the incompatible-merge path
    falls back to per-path conform + unionByName, which expresses the
    same plan (one scan per generation, zero shuffles either way).
    """
    try:
        merged = spark.read.option("mergeSchema", "true").parquet(*paths)
        return conform(merged, target)
    except Exception:
        out = None
        for p in paths:
            part = conform(spark.read.parquet(p), target)
            out = part if out is None else out.unionByName(part)
        return out
