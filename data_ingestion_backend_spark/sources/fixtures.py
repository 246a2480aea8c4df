"""Parquet fixture loaders (the engine's table-scan surface, SURVEY §2.1 S4).

The reference scans Postgres tables through an ORM
(``src/app/repository/*_repository.py``); here every table is a columnar
parquet scan that Catalyst can push filters and projections into.  At
cluster scale the same loaders point at object-store URIs; nothing else
changes.

The one genuinely tricky source is ``events``: fixture generations have
shipped ``ts`` under different physical parquet types — TIMESTAMP(NANOS)
(which Spark 4.x reads as a nanosecond LONG under
``spark.sql.legacy.parquet.nanosAsLong=true``) and tz-naive
``timestamp[us]`` (which Spark reads as TIMESTAMP_NTZ).  A real ingestion
engine must normalize whatever physical timestamp arrives, so
:func:`load_table` converts every variant to one canonical TimestampType;
downstream operators never see LONG/NTZ timestamps.  Under the pinned UTC
session timezone the NTZ→TIMESTAMP cast is exact (no wall-clock shift), and
nanos→micros truncation is safe: event-time operators (windows, watermarks,
dedup ordering) operate at ≥ms granularity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# --- small-scan fan-out (r13 optimization) ----------------------------------
#
# Every fixture table ships as ONE parquet file with ONE row group, and
# parquet splits at row-group granularity — so every scan plans exactly
# one task, and the whole pre-shuffle map stage (regex stats, shingling,
# co-occurrence pair explode, Arrow GEMM batches) runs on ONE core of
# the 32 available.  Measured (guide §2.5 "input skew" / §6 split
# sizing): text_doc_stats 2.6 → 1.3 s, graph_triangles 16.8 → 8.3 s on
# the same boot just by fanning the scan.
#
# The fan is a deterministic function of the TABLE (row count from the
# parquet footer, driver-side, memoized), never of the core count — so
# results are bit-identical across SPARK_GRAFT_CPUS settings (the driver
# benches at two core counts) and across runs (round-robin repartition
# local-sorts its input first, SPARK-23207).  At production scale the
# branch never fires: multi-file / multi-row-group tables already scan
# as many splits, and anything above the size ceiling keeps its native
# split plan.  Env knobs keep it parameterised for other deployments.

_FAN_MAX = int(os.environ.get("SPARK_GRAFT_SMALL_SCAN_FAN", "64"))
_FAN_MIN_ROWS_PER_TASK = 64
_FAN_MAX_BYTES = 256 * 1024 * 1024
_FAN_MEMO: dict[str, int] = {}

#: Tables fanned BY DEFAULT — empty: the fan is strictly CALL-SITE
#: OPT-IN.  Measured on one boot (tools/fanab.py, within-session A/B):
#: the fan wins 1.3–2× exactly where heavy per-row token/n-gram/regex
#: work sits directly on the scan (doc stats, LM surprisal, DSIR grams,
#: substring-span postings, decontamination, the triangle pair explode)
#: and LOSES 1.2–2× everywhere else — relational aggregations pay a
#: full-row exchange before their map-side combine, and composed
#: pipelines (corpus build/datasheet) pay 64-partition scheduling on
#: every checkpoint/join stage downstream of the fanned frame.  Blanket
#: and table-level defaults both regressed the sweep; only the measured
#: winners opt in (`fan_scan=True`).
_FAN_TABLES = set(
    t for t in os.environ.get("SPARK_GRAFT_FAN_TABLES", "").split(",") if t
)


def _small_scan_fan(path: str) -> int:
    """Split fan for a single-file fixture: ≤ _FAN_MAX, ≥64 rows/task,
    0 when the source is not a small local single-row-group file."""
    hit = _FAN_MEMO.get(path)
    if hit is not None:
        return hit
    fan = 0
    try:
        if os.path.isfile(path) and os.path.getsize(path) < _FAN_MAX_BYTES:
            import pyarrow.parquet as pq

            md = pq.ParquetFile(path).metadata
            if md.num_row_groups <= 1:
                fan = min(_FAN_MAX, md.num_rows // _FAN_MIN_ROWS_PER_TASK)
    except Exception:
        fan = 0  # non-parquet layout / remote URI: keep native splits
    fan = 0 if fan <= 1 else fan
    _FAN_MEMO[path] = fan
    return fan


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fan_scan: bool | None = None
) -> DataFrame:
    """Load one fixture table, normalizing physical quirks into clean types.

    ``fan_scan`` — parallelize a single-split small table across a
    deterministic round-robin fan (see the block comment above).  Default
    (None): fan only the `_FAN_TABLES` payload tables; callers whose
    per-row work on other tables is super-linear pass ``True``."""
    if name == "events":
        # runtime-settable; without it Spark refuses TIMESTAMP(NANOS)
        # parquet outright, so callers on vanilla sessions would fail
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if fan_scan is None:
        fan_scan = name in _FAN_TABLES
    if fan_scan:
        fan = _small_scan_fan(path)
        if fan:
            df = df.repartition(fan)
    if name == "events":
        df = normalize_event_time(df)
    return df


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize any physical event-time representation to TimestampType.

    Fixture/source generations vary: LONG nanoseconds (nanosAsLong shim),
    TIMESTAMP_NTZ (tz-naive ``timestamp[us]`` parquet), or already-clean
    TimestampType.  Batch and streaming scans both funnel through here so
    the "downstream sees TimestampType" contract lives in exactly one place.
    """
    if col not in df.columns:
        # Event-time contract: sources without the column pass through
        # unchanged (callers that REQUIRE event time fail on their own
        # terms, with the column name, not an opaque schema KeyError here).
        return df
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        # nanosAsLong shim: LONG nanoseconds → TimestampType (µs precision).
        # `div` is exact integer division — `cast(ts/1000 as long)` would
        # round-trip through DOUBLE (53-bit mantissa < 60-bit ns epoch
        # values) and land ±1µs off the truncated value.
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif isinstance(dt, T.TimestampNTZType):
        # NTZ → TIMESTAMP is exact under the pinned UTC session timezone:
        # the wall-clock fields are reinterpreted as UTC instants 1:1.
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load the fixture star schema as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load fixture tables and register each as a temp view for spark.sql.

    Invalidates the SQL surface's registration memo (plans/catalog.py):
    this function may rebind the same view names to a different sf_dir,
    and a later ``run_sql`` must re-register rather than trust its memo
    over views someone else overwrote.
    """
    from data_ingestion_backend_spark.plans import catalog

    # The memo is keyed by the live session object (WeakKeyDictionary) —
    # popping by session both matches the key type (a string appId would
    # raise: str is not weak-referenceable) and invalidates exactly the
    # session whose views this call is about to rebind.
    try:
        catalog._REGISTERED.pop(spark, None)
    except TypeError:  # mock/stub sessions that refuse weak references
        pass
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
