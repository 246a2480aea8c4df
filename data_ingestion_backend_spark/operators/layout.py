"""Data-layout operators: z-order clustering and small-file compaction.

At 100 TB the scan you avoid is worth more than the scan you optimize —
and what a parquet reader can avoid is decided by FILE LAYOUT, not by
the query plan: min/max column statistics prune a file only if the
writer clustered the data so those ranges are narrow.

- ``zorder_key`` — the bit-interleaved (Morton) clustering key over two
  bucketized dimensions.  Sorting/range-partitioning by it before the
  write gives every output file a bounded rectangle in BOTH dimensions,
  so both ``WHERE user`` and ``WHERE time`` predicates skip files — a
  linear sort gives one dimension perfect bounds and leaves the other
  spanning the whole domain.  ``layout_zorder_stats`` materializes the
  per-bucket (min,max) rectangles — exactly the footer statistics a
  100 TB writer would emit — and the pruning test quantifies the skip
  rate against a linear layout.

- ``compaction_plan`` — bin-packs a file manifest into target-sized
  compaction groups with a running-sum window per partition (month):
  bin = floor(exclusive-prefix-sum / target), the classic streaming
  pack whose bins never exceed target + max_file.  The input is the
  MANIFEST (O(#files) metadata rows, not data); partitioning the window
  by month keeps it distributed and mirrors the real constraint that
  compaction never merges across partition boundaries.

Both are pure Catalyst with engine-identical integer arithmetic, so both
carry full DuckDB oracles.

Reference behavior anchored: the reference stores one object per upload
(``src/services/storage.py``) and never compacts or clusters — these are
the operators its object store would need the day its corpus stops
fitting a single prefix listing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.queries import _register_standalone
from data_ingestion_backend_spark.sources.fixtures import load_table

#: Bits per dimension (the z key is 2*ZBITS wide).
ZBITS = 8
#: Buckets in the demo layout: top Z_BUCKET_BITS of the z key.
Z_BUCKET_BITS = 6


def zorder_key(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Morton interleave of two ``bits``-wide non-negative ints:
    x occupies even bit positions, y odd.  Pure shift/and arithmetic —
    SQL twin is the same expression with ``>>``/``&``/``<<``."""
    z = F.lit(0)
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _zorder_sql(x: str, y: str, bits: int = ZBITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


# The two clustered dimensions of the demo layout: user bucket and
# absolute-hour bucket — the two predicates an events corpus is actually
# queried by.  epoch extraction: both engines agree on
# epoch-seconds-of-timestamp for tz-naive timestamps.
_X = "user_id % 256"
_Y_SPARK = "CAST(FLOOR(unix_seconds(ts) / 3600) AS BIGINT) % 256"
_Y_DUCK = "CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) % 256"


def _zorder_oracle() -> str:
    z = _zorder_sql("x", "y")
    return f"""
WITH dims AS (
  SELECT {_X} AS x, {_Y_DUCK} AS y FROM events
),
keyed AS (SELECT x, y, ({z}) AS z FROM dims)
SELECT (z >> {2 * ZBITS - Z_BUCKET_BITS}) AS zbucket,
       COUNT(*) AS n,
       MIN(x) AS x_min, MAX(x) AS x_max,
       MIN(y) AS y_min, MAX(y) AS y_max
FROM keyed GROUP BY zbucket ORDER BY zbucket"""


@_register_standalone("layout_zorder_stats", _zorder_oracle())
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-z-bucket file statistics of the z-ordered events layout: row
    count and the (min,max) rectangle in both clustered dimensions —
    what each output file's parquet footer would carry after
    ``events.repartitionByRange(N, z).sortWithinPartitions(z)``.

    The write itself is exercised in tests (tiny data); the certified
    part is the layout math: bucket membership and the per-bucket
    bounds, bit-identical across engines."""
    ev = load_table(spark, sf_dir, "events")
    x = F.expr(_X).cast("bigint")
    y = F.expr(_Y_SPARK)
    z = zorder_key(x, y)
    return (
        ev.select(x.alias("x"), y.alias("y"), z.alias("z"))
        .select(
            F.shiftright(F.col("z"), 2 * ZBITS - Z_BUCKET_BITS).alias("zbucket"),
            "x",
            "y",
        )
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        .orderBy("zbucket")
    )


def bucket_bounds(df: DataFrame, key: Column, dims: dict[str, Column], n_buckets_bits: int, key_bits: int) -> DataFrame:
    """Generic per-bucket (min,max) bounds for an arbitrary clustering
    key: the file-skipping index a writer materializes alongside data."""
    b = F.shiftright(key, key_bits - n_buckets_bits).alias("bucket")
    sel = df.select(b, *[c.alias(name) for name, c in dims.items()])
    aggs = []
    for name in dims:
        aggs += [F.min(name).alias(f"{name}_min"), F.max(name).alias(f"{name}_max")]
    return sel.groupBy("bucket").agg(F.count("*").alias("n"), *aggs)


# --------------------------------------------------------------------------
# Compaction planning
# --------------------------------------------------------------------------

def compaction_plan(
    manifest: DataFrame,
    partition: str,
    file_id: str,
    size: str,
    target: Column,
) -> DataFrame:
    """Assign each manifest row to a compaction bin within its partition:
    ``bin = floor(exclusive_prefix_sum(size) / target)`` in ``file_id``
    order.  Greedy-pack guarantee: every bin's total < target +
    max(file size in the partition)."""
    w = (
        Window.partitionBy(partition)
        .orderBy(file_id)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(size).over(w) - F.col(size)
    return manifest.withColumn(
        "bin", F.floor(cum / target).cast("bigint")
    )


_COMPACT_ORACLE = """
WITH manifest AS (
  SELECT DATE_TRUNC('month', CAST(l_shipdate AS TIMESTAMP)) AS month,
         CAST(DATE_TRUNC('day', CAST(l_shipdate AS TIMESTAMP)) AS TIMESTAMP) AS file_id,
         COUNT(*) AS size
  FROM lineitem GROUP BY 1, 2
),
sized AS (
  SELECT m.*, CAST(CEIL(SUM(size) OVER (PARTITION BY month) / 4.0) AS BIGINT) AS target
  FROM manifest m
),
binned AS (
  SELECT month, file_id, size,
         CAST(FLOOR(CAST(SUM(size) OVER (
             PARTITION BY month ORDER BY file_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - size
           AS DOUBLE) / target) AS BIGINT) AS bin
  FROM sized
)
SELECT month, bin, COUNT(*) AS n_files, SUM(size) AS total_size,
       MIN(file_id) AS first_file, MAX(file_id) AS last_file
FROM binned GROUP BY month, bin ORDER BY month, bin"""


@_register_standalone("layout_compaction_plan", _COMPACT_ORACLE)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certified compaction plan over a synthetic manifest (one "file"
    per lineitem ship-day, sized by its row count): pack each month's
    files into ~4 target-sized bins and emit the per-bin summary a
    compactor would execute.  The target derives from the partition's
    own mass, so the plan shape is stable across scale factors."""
    manifest = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            F.date_trunc("month", F.col("l_shipdate")).alias("month"),
            F.date_trunc("day", F.col("l_shipdate")).alias("file_id"),
        )
        .agg(F.count("*").alias("size"))
    )
    sized = manifest.withColumn(
        "target",
        F.ceil(
            F.sum("size").over(Window.partitionBy("month")) / F.lit(4.0)
        ).cast("bigint"),
    )
    binned = compaction_plan(
        sized, "month", "file_id", "size", F.col("target").cast("double")
    )
    return (
        binned.groupBy("month", "bin")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("size").alias("total_size"),
            F.min("file_id").alias("first_file"),
            F.max("file_id").alias("last_file"),
        )
        .orderBy("month", "bin")
    )
