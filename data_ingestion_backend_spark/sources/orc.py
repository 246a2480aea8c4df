"""ORC source/sink — the second columnar at-rest format.

Parquet is this engine's default (fixtures, warehouse snapshots), but
Hive-lineage deployments hand an ingestion engine ORC files just as
often, and "switch a table's format" must be a format-string change,
not a pipeline rewrite.  Spark's ORC support is built in (native
vectorized reader), so this module is deliberately thin: the value it
adds is the CONTRACT — round-trip fidelity and scan-pushdown parity
with parquet, both pinned by tests — not the I/O itself.

Scale notes: ORC carries the same scan-avoidance machinery as parquet
(column projection, predicate pushdown into stripe/row-group indexes,
partition pruning on hive layouts); ``tests/test_orc.py`` asserts
``PushedFilters``/``ReadSchema`` appear in the ORC scan exactly as the
parquet plan tests do, so a format switch cannot silently turn a
pruned scan into a full read.  Zstd compression is the default here
(parquet sinks in this repo use snappy defaults; ORC's zstd is the
current size/speed sweet spot and is splittable per stripe either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    writer = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
