"""Skew and co-location machinery for 100 TB operation.

Two techniques the big-cluster playbook needs beyond AQE's defaults:

- **Salted two-phase aggregation** — when one group key is pathologically
  hot (a single user with 10⁹ events), the partial-aggregate for that key
  still lands on one reducer.  Salting splits each group into ``n_salts``
  subgroups for the first aggregation, then combines subtotals in a
  second, tiny aggregation.  Works for any decomposable aggregate
  (sum/count/min/max); results are bit-identical for exact types.

- **Bucketed tables** — pre-hash-partitioning both sides of a recurring
  fact⋈fact join (``bucketBy`` on the join key, same bucket count) lets
  Spark plan a SortMergeJoin with NO Exchange on either side: the shuffle
  happens once at write time and is amortized over every subsequent join.
  This is the parquet-native answer to the reference's Postgres indexes
  on FK columns (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


#: combine functions a salted subtotal can be merged with
_COMBINES = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column | tuple[Column, str]],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase (salted) aggregation for skewed group keys.

    ``aggs`` maps output column name → ``(aggregate, combine)`` where
    ``aggregate`` is a *decomposable* aggregate over the input and
    ``combine`` ∈ {'sum','min','max'} says how phase 2 merges the per-salt
    subtotals (count/sum subtotals combine by SUM; min/max by themselves).
    The tuple is the API; a bare ``Column`` is accepted ONLY where the
    expression text is unambiguous: ``min``/``max`` (whose DISTINCT
    variants are semantically identical, so mis-detection is harmless)
    and literal ``count(*)``/``count(1)``.  Everything else — including
    bare ``F.sum`` — raises: ``sum_distinct(v)`` stringifies *identically*
    to ``sum(v)`` ("sum(v)"), and silently SUM-combining distinct
    subtotals returns plausible-looking wrong numbers (a value appearing
    under several salts re-counts once per salt).  Passing an explicit
    ``(expr, combine)`` is the caller asserting decomposability.
    Phase 1 aggregates by (keys, salt); phase 2 re-aggregates the
    subtotals by keys.  The salt is derived deterministically from
    ``salt_source`` (a high-cardinality column, e.g. the event id) so
    replays produce identical partitioning.

    Example::

        salted_aggregate(events, ["user_id"],
                         {"n": F.count("*"),
                          "total": (F.sum("value"), "sum"),
                          "last_ts": F.max("ts")},
                         salt_source="event_id")
    """

    def resolve(name: str, spec: Column | tuple[Column, str]) -> tuple[Column, str]:
        if isinstance(spec, tuple):
            expr, combine = spec
            if combine not in _COMBINES:
                raise ValueError(
                    f"salted_aggregate: unknown combine {combine!r} for "
                    f"{name!r}; expected one of {sorted(_COMBINES)}"
                )
            return expr, combine
        s = str(spec)
        inner = s.split("'")[1].strip().lower() if "'" in s else s.lower()
        head = inner.split("(")[0]
        if head in ("min", "max"):
            return spec, head  # DISTINCT variant is semantically identical
        if inner in ("count(1)", "count(*)"):
            return spec, "sum"
        raise ValueError(
            f"salted_aggregate: cannot infer a combine for {name!r} "
            f"(expression {inner!r}); pass an explicit "
            f"(expr, 'sum'|'min'|'max') tuple — bare sum is refused "
            f"because sum_distinct stringifies identically to sum, and "
            f"non-decomposable aggregates (avg, count_distinct, first, "
            f"...) cannot be salted at all"
        )

    resolved = {name: resolve(name, spec) for name, spec in aggs.items()}
    salt = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
        if salt_source
        else F.pmod(F.spark_partition_id().cast("long"), F.lit(n_salts))
    )
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(f"_p_{name}") for name, (expr, _) in resolved.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[
            _COMBINES[combine](F.col(f"_p_{name}")).alias(name)
            for name, (_, combine) in resolved.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list,
    n_salts: int = 16,
    fact_salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted equi-join for the shape AQE's two defenses miss: the
    join key is hot on the FACT side and the other side is too large to
    broadcast (past ``autoBroadcastJoinThreshold``), so the plain plan
    is a sort-merge join whose hot key lands on one reducer.

    Only the HOT keys are salted (replicating the whole dim n_salts ways
    would multiply the dim shuffle by n_salts for nothing): fact rows on
    a hot key get a deterministic salt in [0, n_salts) derived from
    ``fact_salt_source`` (a high-cardinality column — replays partition
    identically, same discipline as ``salted_aggregate``), every other
    row gets salt 0; dim rows on a hot key are replicated once per salt,
    every other dim row rides with salt 0.  The join is then on
    (key, _salt) — the hot key's probe rows spread over n_salts
    reducers, each holding a full replica of that key's (few) dim rows.

    Result equality with the plain join is exact for ``inner`` and
    ``left``: a fact row carries exactly ONE salt, and the dim rows for
    its key exist at exactly that salt value (replicated when hot, salt
    0 otherwise), so every (fact, dim) pair appears exactly once.
    ``right``/``full`` are refused — an unmatched replicated dim row
    would surface once per salt.

    ``hot_keys`` is the caller's (small) list of known-hot values —
    from a stats table, yesterday's AQE skew report, or a sampled
    top-k; at 100 TB the list is metadata, not data.  When AQE's
    skew-split CAN see the skew (sort-merge, post-shuffle), prefer it
    (zero code); this form exists for the cases it cannot: skew hidden
    behind a bucketed/co-partitioned join (no exchange for AQE to
    re-plan) or a build side that individual reducers must hold.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join: how={how!r} not supported — replicated dim "
            "rows would duplicate unmatched right/full output"
        )
    if not hot_keys:
        return fact.join(dim, key, how)
    if fact_salt_source is None:
        raise ValueError(
            "salted_join: fact_salt_source is required (deterministic "
            "salting — rand() would break replays and the oracle)"
        )
    is_hot = F.col(key).isin(*hot_keys)
    fact_s = fact.withColumn(
        "_salt",
        F.when(
            is_hot,
            F.pmod(F.xxhash64(F.col(fact_salt_source)), F.lit(n_salts)).cast("int"),
        ).otherwise(F.lit(0)),
    )
    dim_s = dim.withColumn(
        "_salt",
        F.explode(
            F.when(
                is_hot, F.sequence(F.lit(0), F.lit(n_salts - 1))
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    return fact_s.join(dim_s, [key, "_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Materialize df as a bucketed+sorted table on the join key.

    One shuffle now, zero shuffles for every future equi-join/aggregation
    on ``key`` against any table bucketed the same way.  ``path`` makes it
    an external table (catalog metadata + data at an explicit location —
    ``spark.sql.warehouse.dir`` is static and often not writable).
    """
    writer = (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — plans with no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def bloom_prune_keys(fact: DataFrame, key: str, bits: DataFrame) -> DataFrame:
    """Drop fact rows whose ``key`` CANNOT be in the set the Bloom bit
    table was built over (``sketches.bloom_build``) — before any shuffle.

    Shape: K broadcast LEFT SEMI probes against the (≤ 2^20-row, ~8 MB)
    bit table, one per hash function — every probe is map-side, so the
    fact is pruned without exploding rows or re-grouping (the
    ``bloom_might_contain`` verdict shape costs an explode + a
    fact-sized groupBy — right for emitting a verdict column, wrong for
    pruning).  No false negatives: a surviving superset goes into the
    real join, which removes the (bounded-rate) false positives, so the
    composed result is EXACTLY the plain join's.

    When this wins at 100 TB: the build side's key set is too large to
    broadcast as keys (tens of millions of 8-byte keys + hash overhead)
    but its Bloom image is fixed-size; the fact-side shuffle then moves
    only rows that can match.  Size ``sketches.BLOOM_BITS`` at ~10 bits
    per build key — past ~m/10 keys the filter saturates and prunes
    nothing (it never becomes wrong, just useless).  Spark's own runtime
    bloom filter (spark.sql.optimizer.runtime.bloomFilter.enabled) makes
    the same move per-query; this explicit form exists so the bit table
    can be MATERIALIZED and reused across queries/days (e.g. the corpus
    membership gate), which a runtime filter cannot.
    """
    from data_ingestion_backend_spark.operators.sketches import (
        BLOOM_K,
        _bloom_bit,
    )

    out = fact
    probe = F.col(key).cast("string")
    # Each probe's build side is the IDENTICAL aliased subtree (same
    # column name every round — semi-join output never carries the right
    # side, so there is no ambiguity), which lets Spark's ReuseExchange
    # rule broadcast the bit table ONCE and share it across all K probes
    # instead of recomputing the build per probe.
    for i in range(BLOOM_K):
        b = bits.select(F.col("bit").alias("_bloom_probe_bit"))
        out = out.join(
            F.broadcast(b),
            _bloom_bit(i, probe) == F.col("_bloom_probe_bit"),
            "left_semi",
        )
    return out


# --- driver-graded query: the salted path against a plain-SQL oracle --------

from data_ingestion_backend_spark.operators.queries import (  # noqa: E402
    DEC2,
    _register,
    _register_standalone,
    dbl,
)
from data_ingestion_backend_spark.sources.fixtures import load_table  # noqa: E402


@_register_standalone(
    "scale_bloom_pruned_join",
    """SELECT CAST(DATE_TRUNC('month', o.o_orderdate) AS TIMESTAMP) AS month,
              CAST(COUNT(*) AS BIGINT) AS n_items,
              ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE), 2)
                AS revenue
       FROM lineitem l
       JOIN orders o ON o.o_orderkey = l.l_orderkey
       WHERE o.o_orderstatus = 'F' AND o.o_orderpriority = '1-URGENT'
       GROUP BY DATE_TRUNC('month', o.o_orderdate)
       ORDER BY month""",
)
def scale_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim-subset revenue where the fact is Bloom-pruned BEFORE the
    join — certified against the PLAIN join (the DuckDB oracle), which is
    exactly what the composed bloom-gate + join must equal: the gate never
    drops a matching row (no false negatives) and the join's own equality
    predicate removes the gate's false positives.

    The plan the oracle can't see (pinned by tests/test_plans.py): K
    broadcast semi probes prune lineitem map-side, so only
    possibly-matching rows reach the join — the 100 TB shape where the
    urgent-finished order keys are too many to ship as a broadcast list
    but their Bloom image is a fixed ~8 MB.
    """
    from data_ingestion_backend_spark.operators.dedup import _session_persisted
    from data_ingestion_backend_spark.operators.sketches import bloom_build

    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "1-URGENT")
    )
    # The bit table feeds all K probe broadcasts; session-memoized so the
    # build (scan+explode+distinct) runs once, not once per probe — the
    # in-query analogue of the "materialize the filter" deployment shape
    # the docstring above describes.
    bits = _session_persisted(
        spark,
        sf_dir,
        "bloom_bits_urgent_finished_orders",
        lambda: bloom_build(
            orders.select(F.col("o_orderkey").cast("string").alias("h")), "h"
        ),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast(DEC2)
            * (F.lit(1) - F.col("l_discount")).cast(DEC2)
        ).alias("rev"),
    )
    pruned = bloom_prune_keys(li, "l_orderkey", bits)
    return (
        pruned.join(
            orders.select("o_orderkey", "o_orderdate"),
            pruned["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            dbl(F.sum("rev"), 2).alias("revenue"),
        )
        .orderBy("month")
    )


@_register(
    "scale_salted_user_totals",
    """SELECT user_id,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
                AS total_value
       FROM events
       GROUP BY user_id
       ORDER BY user_id""",
)
def scale_salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event totals via the SALTED two-phase aggregation path.

    Functionally identical to a plain groupBy (which is exactly what the
    DuckDB oracle runs) but executed as (user_id, salt)-partial →
    recombine, the shape that survives a pathologically hot user at
    100 TB.  Decimal sums make the two-phase recombination bit-exact, so
    the salted plan is oracle-certified — not just property-tested.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("value").cast(DEC2).alias("v")
    )
    out = salted_aggregate(
        ev,
        ["user_id"],
        {"n_events": F.count("*"), "total_value": (F.sum("v"), "sum")},
        salt_source="event_id",
    )
    return out.select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        dbl(F.col("total_value"), 2).alias("total_value"),
    ).orderBy("user_id")


@_register_standalone(
    "scale_salted_join_segments",
    """WITH dim AS (
         SELECT DISTINCT user_id, user_id % 7 AS segment FROM events
       )
       SELECT d.segment,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
              ROUND(CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE), 2)
                AS total_value
       FROM events e JOIN dim d ON d.user_id = e.user_id
       GROUP BY d.segment
       ORDER BY d.segment""",
)
def scale_salted_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment event totals THROUGH the salted-join path.

    The DuckDB oracle runs the plain join; the Spark side routes the
    same join through :func:`salted_join` with three keys declared hot
    (replicated dim rows + deterministic fact salts), so the whole
    replicate/spread/join machinery is oracle-certified — the salted
    plan must be row-for-row the plain join or the aggregate hashes
    diverge.  The fixture's keys are near-uniform; correctness of the
    mechanism is independent of whether the declared keys are truly hot
    (the measured hot-key win lives in `tools/skewbench.py` / SCALE.md
    §8 where real 20% skew is planted).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("value").cast(DEC2).alias("v")
    )
    dim = (
        ev.select("user_id").distinct().withColumn("segment", F.col("user_id") % 7)
    )
    hot = [1, 2, 3]  # deterministic; mechanism-exercising, see docstring
    joined = salted_join(ev, dim, "user_id", hot, fact_salt_source="event_id")
    return (
        joined.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            dbl(F.sum("v"), 2).alias("total_value"),
        )
        .orderBy("segment")
    )


def bucket_point_lookup(spark: SparkSession, table: str, key: str, value) -> list:
    """Point lookup on a bucketed table, reading ONE bucket's files.

    The third scan-avoidance tier after partition pruning (warehouse
    hive layout) and stripe/row-group pushdown (parquet/ORC filters):
    an equality predicate on the bucketing key hashes to exactly one
    bucket, so the scan lists 1/n_buckets of the files BEFORE any
    footer is read — at 100 TB a keyed lookup touches gigabytes, not
    the table.  Spark's planner only applies bucket pruning on a
    BUCKETED scan, and ``autoBucketedScan`` silently downgrades to a
    plain file scan when no join/aggregation wants the distribution —
    so the knob is pinned off for the lookup's duration (plan-time
    conf, restored after the collect).  The collect is control-plane
    by definition: a point lookup's result is key-cardinality-sized.
    ``tests/test_scale.py`` pins ``SelectedBucketsCount: 1 out of N``.
    """
    conf_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "false")
    try:
        return spark.table(table).filter(F.col(key) == value).collect()
    finally:
        spark.conf.set(conf_key, prev)
