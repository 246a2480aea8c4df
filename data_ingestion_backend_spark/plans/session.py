"""SparkSession factory with the engine's pinned configuration.

The reference keeps a SQLAlchemy engine + connection pool
(``src/app/db/database.py:10-21`` in the reference repo); our analogue is one
long-lived SparkSession configured for deterministic, oracle-checkable
results locally and for shuffle/broadcast efficiency at cluster scale.

Pinned configs and why:

- ``spark.sql.legacy.parquet.nanosAsLong=true`` — the ``events`` fixture
  stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark 4.x refuses to read
  natively (PARQUET_TYPE_ILLEGAL).  With this flag the column arrives as a
  raw nanosecond LONG and :mod:`..sources.fixtures` converts it to a proper
  timestamp via ``timestamp_micros(ts div 1000)``.
- ``spark.sql.session.timeZone=UTC`` — date_trunc/window results must not
  depend on the host timezone (the DuckDB oracle runs in UTC semantics).
- ``spark.sql.adaptive.enabled=true`` (+ coalescePartitions, skewJoin) —
  AQE re-plans shuffles at runtime: coalesces tiny post-shuffle partitions
  at test scale and splits skewed join partitions at 100 TB scale.
- ``spark.sql.shuffle.partitions`` — default 32 locally (one per core);
  on a real cluster AQE's coalescing makes the initial number mostly
  irrelevant as long as it is high enough, so deployments should raise it
  (e.g. 2000+) via ``extra_conf`` or --conf.
- ``spark.sql.autoBroadcastJoinThreshold`` kept at default (10 MB): the
  dimension tables (region/nation/supplier/jobs-ledger) stay broadcastable
  even at SF where facts reach 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# One master switch for local testing; a real deployment passes its own
# master / executor topology through spark-submit and these are ignored.
_DEFAULT_LOCAL_CORES = os.environ.get("SPARK_GRAFT_CPUS", "*")

ENGINE_CONF: dict[str, str] = {
    # Static conf — takes effect only when this factory starts the JVM.
    # The 1g default OOMs under continuous-trigger streaming (micro-batch
    # bookkeeping + parquet writers + UI state in one local JVM).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for the few pandas_udf extension operators (similarity/multimodal).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Local default: one shuffle partition per core.  Cluster deployments
    # override; AQE coalesces the excess either way.
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    ),
    # Deterministic parquet reads regardless of host default.
    "spark.sql.parquet.datetimeRebaseModeInRead": "CORRECTED",
    "spark.sql.parquet.int96RebaseModeInRead": "CORRECTED",
    # Hive-partitioned maintained state grows to thousands of leaf
    # directories; above this threshold Spark schedules a LISTING JOB
    # per table read, and the incremental build's ~25 actions per batch
    # each paid one at grown state (seconds of pure scheduling).  Local
    # driver-side listing walks the same directories in milliseconds;
    # a real cluster deployment reading a manifest-based table format
    # (Delta/Iceberg) doesn't list at all.
    "spark.sql.sources.parallelPartitionDiscovery.threshold": "100000",
    # Quieter driver logs in test runs.
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(
    app_name: str = "data-ingestion-backend-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master=None`` means: respect an externally-provided master (e.g. from
    spark-submit) and fall back to ``local[N]`` for standalone runs.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{_DEFAULT_LOCAL_CORES}]")
    conf = dict(ENGINE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
