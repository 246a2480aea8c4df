"""Time-series operators: gap filling, event-gap analysis, grouping sets.

Three shapes every event-analytics engine grows into once the basic
windowed aggregates (q19/q22/q36) exist:

- **hourly gap-fill + linear interpolation** — a dense per-series spine
  (``sequence`` over the series' own [min, max] hour range) left-joined
  to the sparse observed aggregate, missing points interpolated between
  the nearest observed neighbours.  This is the standard "regularize an
  irregular series" step before any rolling-window model.
- **event-gap profile** — per-user inter-arrival gaps via ``lag`` with a
  unique-key tiebreak, aggregated to count/max/mean.  The inverse view of
  sessionization (q30): instead of cutting sessions at a threshold it
  characterizes the gap distribution itself.
- **grouping sets** — multi-tier aggregation for disjoint key sets,
  planned as a union of independent partial aggregations instead of
  Spark's ``Expand``-based GROUPING SETS (which multiplies every input
  row by the number of tiers *before* the shuffle; see q38's cube
  rationale in queries2.py).

Scale notes (100 TB design):
- The gap-fill spine is ~series x span rows — tiny relative to the raw
  events (it is the *aggregated* grain).  The join is spine ⋈ daily on
  (series, hour): both sides are post-aggregation, so the heavy shuffle
  is the one hourly aggregation with map-side combine; the window pass
  partitions by series, which is the natural parallelism unit.
- Event gaps shuffle once on user_id (hash-partitioned window), then
  aggregate within the same partitioning — no second shuffle.
- Grouping-set tiers each do partial aggregation before their shuffle;
  total shuffled rows = sum of tier cardinalities, vs Expand's
  |input| x tiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_ingestion_backend_spark.operators.queries import (
    _register,
    _register_standalone,
    dbl,
)
from data_ingestion_backend_spark.sources.fixtures import load_table

# --------------------------------------------------------------------------
# Hourly gap-fill with linear interpolation
# --------------------------------------------------------------------------

_GAPFILL_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
         SUM(CAST(value AS DECIMAL(18,6))) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi FROM hourly GROUP BY 1
),
spine AS (
  SELECT b.event_type,
         unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS hr
  FROM bounds b
),
j AS (
  SELECT s.event_type, s.hr, h.v
  FROM spine s LEFT JOIN hourly h USING (event_type, hr)
),
w AS (
  SELECT event_type, hr, v,
    LAST_VALUE(v IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY hr
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    LAST_VALUE(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY hr
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
    FIRST_VALUE(v IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY hr
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY hr
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM j
)
SELECT event_type, hr,
       CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap,
       round(CASE
         WHEN v IS NOT NULL THEN CAST(ROUND(v, 4) AS DOUBLE)
         WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
           CAST(pv AS DOUBLE)
           + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
             * CAST(date_diff('hour', pd, hr) AS DOUBLE)
             / CAST(date_diff('hour', pd, nd) AS DOUBLE)
         ELSE CAST(COALESCE(pv, nv) AS DOUBLE)
       END, 4) AS v_filled
FROM w
ORDER BY event_type, hr
"""


@_register("ts_gapfill_hourly", _GAPFILL_SQL)
def ts_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event_type with linear interpolation.

    Sparse hourly aggregate (exact decimal sum, map-side combined) →
    per-series dense spine via ``sequence(lo, hi, interval 1 hour)`` →
    left join → interpolate missing hours between the nearest observed
    neighbours (``last/first ... ignoreNulls`` frames).  Series with one
    observed neighbour only (leading/trailing gaps — impossible here
    because the spine is bounded by observed points, but kept for
    general inputs) carry the nearest value flat.
    """
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("v"))
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.expr("sequence(lo, hi, interval 1 hour)")
            ).alias("hr"),
        )
    )
    j = spine.join(hourly, ["event_type", "hr"], "left")

    back = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hr = F.when(F.col("v").isNotNull(), F.col("hr"))
    w = j.select(
        "event_type",
        "hr",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_hr, ignorenulls=True).over(back).alias("pd"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_hr, ignorenulls=True).over(fwd).alias("nd"),
    )
    interp = (
        F.col("pv").cast("double")
        + (F.col("nv").cast("double") - F.col("pv").cast("double"))
        * F.expr("timestampdiff(HOUR, pd, hr)").cast("double")
        / F.expr("timestampdiff(HOUR, pd, nd)").cast("double")
    )
    filled = (
        # Observed branch: exact HALF_UP decimal round to the terminal
        # scale (4 < summed scale 6) BEFORE the double cast, mirrored in
        # the oracle — see the q32 midpoint note in queries2.py.
        F.when(F.col("v").isNotNull(), F.round(F.col("v"), 4).cast("double"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp
        )
        .otherwise(F.coalesce("pv", "nv").cast("double"))
    )
    return w.select(
        "event_type",
        "hr",
        F.when(F.col("v").isNull(), 1).otherwise(0).cast("int").alias("is_gap"),
        F.round(filled, 4).alias("v_filled"),
    ).orderBy("event_type", "hr")


# --------------------------------------------------------------------------
# Per-user inter-arrival gap profile
# --------------------------------------------------------------------------

_EVENT_GAPS_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(CAST(ts AS TIMESTAMP))
           - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS gap_us
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
       round(CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us), 2) AS avg_gap_us
FROM g
GROUP BY user_id
ORDER BY user_id
"""


@_register_standalone("ts_event_gaps", _EVENT_GAPS_SQL)
def ts_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap profile per user (lag with event_id tiebreak).

    One shuffle on user_id: the lag window hash-partitions by user, and
    the subsequent per-user aggregate reuses that partitioning (Catalyst
    sees the child distribution satisfies the agg's requirement — no
    second exchange).  Gap arithmetic is exact integer microseconds;
    only the final mean divides into a double.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    g = events.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    )
    return (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count("gap_us").cast("bigint").alias("n_gaps"),
            F.max("gap_us").cast("bigint").alias("max_gap_us"),
            F.round(
                F.sum("gap_us").cast("double") / F.count("gap_us"), 2
            ).alias("avg_gap_us"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Grouping sets as a union of independent aggregations (no Expand)
# --------------------------------------------------------------------------

_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus, l_linenumber,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(GROUPING(l_returnflag, l_linestatus, l_linenumber) AS INT) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linenumber), ())
ORDER BY gid, l_returnflag, l_linestatus, l_linenumber
"""


@_register("agg_grouping_sets", _GROUPING_SETS_SQL)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((flag,status),(linenumber),()) without Expand.

    Spark's native GROUPING SETS plans an Expand that replicates every
    input row once per tier before the shuffle — 3x the shuffle volume
    here, Nx in general.  Disjoint key sets can't share partials, so the
    scale-correct plan is simply one partially-aggregated pass per tier,
    unioned; total shuffled rows = sum of tier cardinalities (bounded by
    distinct key combos, not input size).  ``gid`` mirrors DuckDB/Spark's
    GROUPING() bitmask for the (flag, status, shipmode) ordering.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        "l_linenumber",
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
    )

    def tier(df: DataFrame, keys: list[str], gid: int) -> DataFrame:
        agged = (
            df.groupBy(*keys).agg(
                F.sum("qty").alias("sum_qty_w"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
            )
            if keys
            else df.agg(
                F.sum("qty").alias("sum_qty_w"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
            )
        )
        cols = []
        for c in ("l_returnflag", "l_linestatus", "l_linenumber"):
            typ = "int" if c == "l_linenumber" else "string"
            cols.append(
                F.col(c) if c in keys else F.lit(None).cast(typ).alias(c)
            )
        return agged.select(
            *cols,
            dbl(F.col("sum_qty_w"), 2).alias("sum_qty"),
            "n",
            F.lit(gid).cast("int").alias("gid"),
        )

    out = (
        tier(li, ["l_returnflag", "l_linestatus"], 1)
        .unionByName(tier(li, ["l_linenumber"], 6))
        .unionByName(tier(li, [], 7))
    )
    return out.orderBy("gid", "l_returnflag", "l_linestatus", "l_linenumber")


# --------------------------------------------------------------------------
# Per-series z-score anomaly detection
# --------------------------------------------------------------------------

#: flag observations this many sample standard deviations from the series mean
ZSCORE_THRESHOLD = 3.0

_ZSCORE_SQL = f"""
WITH stats AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS m,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))
                        * CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS m2
  FROM events GROUP BY event_type
),
z AS (
  SELECT e.event_id, e.event_type, e.value,
         CAST(SIGN(zr) * FLOOR(ABS(zr) * 10000.0) AS BIGINT) / 10000.0 AS zscore
  FROM (
    SELECT e.*, s.n, s.m, s.m2,
           (e.value - s.m / s.n)
             / sqrt((s.m2 - s.m * s.m / s.n) / (s.n - 1)) AS zr
    FROM events e JOIN stats s USING (event_type)
    WHERE s.n > 1 AND (s.m2 - s.m * s.m / s.n) > 0
  ) e
)
SELECT event_id, event_type, ROUND(value, 2) AS value, zscore
FROM z WHERE ABS(zscore) >= {ZSCORE_THRESHOLD}
ORDER BY event_id
"""


@_register_standalone("ts_anomaly_zscore", _ZSCORE_SQL)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical QC: events whose value sits ≥ 3 sample standard
    deviations from their series (event_type) mean.

    Two-pass shape, NOT a per-series window: pass 1 aggregates
    (n, Σv, Σv²) per series — decimal sums, so the moments are exact and
    partial-aggregation order can't change them — into a series-count-
    sized table; pass 2 broadcast-joins the moments back to the raw
    events and computes z map-side.  A window over partitionBy(series)
    would shuffle the WHOLE fact onto |series| reducers (5 here — a
    built-in hot key at 100 TB); the two-pass form's only shuffle is the
    map-side-combined moment aggregation, and the flagging pass is
    embarrassingly parallel.

    Cross-engine determinism: both engines cast the SAME exact decimal
    moments to double, then evaluate the SAME IEEE expression
    (mean = m/n, var = (m2 − m²/n)/(n−1), z = (v − mean)/√var), and the
    terminal z is snapped to 4 dp before the threshold comparison — so
    the flagged row SET (not just the scores) matches bit-for-bit.
    """
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return zscore_flags(events).orderBy("event_id")


def zscore_flags(
    events: DataFrame,
    series_col: str = "event_type",
    value_col: str = "value",
    threshold: float = ZSCORE_THRESHOLD,
) -> DataFrame:
    """The reusable core of ``ts_anomaly_zscore`` (any keyed frame)."""
    vdec = F.col(value_col).cast("decimal(18,6)")
    # Round the moments IN EXACT DECIMAL, then cast: Σv² is an exact
    # scale-12 decimal, so values exactly on a 6-dp midpoint
    # (…5000000 at scale 12) are reachable, and ROUND(double, 6) on
    # those is the cross-engine midpoint hazard — decimal HALF_UP is
    # identical on both engines, and identical decimals cast to
    # identical doubles.
    stats = events.groupBy(series_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(vdec), 6).cast("double").alias("m"),
        F.round(F.sum(vdec * vdec), 6).cast("double").alias("m2"),
    )
    mean = F.col("m") / F.col("n")
    var = (F.col("m2") - F.col("m") * F.col("m") / F.col("n")) / (F.col("n") - 1)
    # FLOOR-grid snap, not ROUND: both engines compute the identical IEEE
    # double, and floor(x*1e4) is exact on identical doubles — ROUND
    # diverges when the double sits a hair off a .00005 midpoint (Spark
    # rounds the exact binary expansion HALF_UP, DuckDB rounds in float;
    # observed once at sf0.1 in the MAD twin).  Same trick as
    # delta.snapshot_diff's floor-cents tokens.  Snapped SYMMETRICALLY
    # about zero (sign·floor|z|): a plain floor admits z = −2.99995 (→
    # −3.0000) but not +2.99995 (→ +2.9999) — an epsilon-lower effective
    # threshold for negative outliers only.
    zraw = (F.col(value_col) - mean) / F.sqrt(var)
    z = (
        (F.signum(zraw) * F.floor(F.abs(zraw) * 10000.0))
        .cast("bigint")
        / 10000.0
    )
    keep = [c for c in events.columns if c != value_col]
    return (
        events.join(F.broadcast(stats), series_col)
        # degenerate series (single point / constant values) have no
        # standard deviation: drop them BEFORE dividing — a NaN z-score
        # would hit the one place Spark and DuckDB genuinely disagree
        # (NaN compares greater than everything in Spark filters)
        .filter(
            (F.col("n") > 1)
            & ((F.col("m2") - F.col("m") * F.col("m") / F.col("n")) > 0)
        )
        .select(
            *keep,
            F.round(F.col(value_col), 2).alias(value_col),
            z.alias("zscore"),
        )
        .filter(F.abs(F.col("zscore")) >= threshold)
    )


# --------------------------------------------------------------------------
# Robust (median / MAD) anomaly detection — the z-score's heavy-tail twin
# --------------------------------------------------------------------------

#: Iglewicz–Hoaglin modified-z threshold and consistency constant
MAD_THRESHOLD = 3.5
MAD_C = 0.6745

_MAD_SQL = f"""
WITH med AS (
  SELECT event_type, round(quantile_cont(value, 0.50), 6) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_id, e.event_type, e.value, m.med,
         ABS(e.value - m.med) AS d
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, round(quantile_cont(d, 0.50), 6) AS mad
  FROM dev GROUP BY event_type
)
SELECT event_id, event_type, ROUND(value, 2) AS value,
       CAST(SIGN({MAD_C} * (value - med) / mad)
            * FLOOR(ABS({MAD_C} * (value - med) / mad) * 10000.0) AS BIGINT)
         / 10000.0 AS rz
FROM dev JOIN mad USING (event_type)
WHERE mad > 0
  AND ABS(CAST(SIGN({MAD_C} * (value - med) / mad)
               * FLOOR(ABS({MAD_C} * (value - med) / mad) * 10000.0) AS BIGINT)
            / 10000.0) >= {MAD_THRESHOLD}
ORDER BY event_id
"""


@_register_standalone("ts_anomaly_mad", _MAD_SQL)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modified z-score outliers: rz = 0.6745·(v − median)/MAD, flagged at
    |rz| ≥ 3.5 (Iglewicz & Hoaglin 1993).  The parametric z-score above
    assumes the mean/stddev describe the series; on heavy-tailed series
    the outliers INFLATE the stddev and hide themselves — median/MAD have
    a 50% breakdown point, so this is the variant to trust on unvetted
    data.

    Shape: two exact-percentile aggregations (series-count-sized outputs)
    each broadcast back to the fact — the same two-pass/broadcast
    discipline as ``zscore_flags``; no window over the 5-value series
    key.  Exact per-group percentiles buffer group values at the reducer,
    so this form is verification-grade: at 100 TB swap both medians for
    the mergeable GK sketch (``sketches.approx_value_quantiles``) and
    keep the identical flagging logic.

    Cross-engine: Spark ``percentile`` ≡ DuckDB ``quantile_cont`` (the
    q35-certified equivalence); both medians are snapped to 6 dp before
    any downstream arithmetic, so dev/rz are identical IEEE expressions
    over identical inputs, and the terminal rz is snapped to 4 dp before
    the threshold — the flagged SET matches, not just the scores.
    """
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    med = events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5D)"), 6).alias("med")
    )
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(d, 0.5D)"), 6).alias("mad")
    )
    # FLOOR-grid snap (see zscore_flags): exact on identical doubles,
    # where ROUND(x, 4) was observed to split a near-midpoint at sf0.1.
    # Symmetric about zero (sign·floor|rz|) so negative outliers aren't
    # admitted at an epsilon-lower effective threshold than positive.
    rzraw = F.lit(MAD_C) * (F.col("value") - F.col("med")) / F.col("mad")
    rz = (
        (F.signum(rzraw) * F.floor(F.abs(rzraw) * 10000.0))
        .cast("bigint")
        / 10000.0
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .select(
            "event_id",
            "event_type",
            F.round(F.col("value"), 2).alias("value"),
            rz.alias("rz"),
        )
        .filter(F.abs(F.col("rz")) >= MAD_THRESHOLD)
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Integer EWMA: sequential per-series fold, cross-engine exact
# --------------------------------------------------------------------------
#
# The one computation class the window families above don't cover:
# a SEQUENTIAL recurrence (each output depends on the previous output,
# not on a frame of inputs).  SQL windows can't express it; the
# idiomatic Spark form is an ordered per-series fold.  Float EWMA can
# never hash-match across engines (every step compounds rounding in
# engine-specific order), so the recurrence runs on a 1e-2 integer grid
# with integer division — exact and sign-safe: Spark's div and DuckDB's
# integer // both truncate toward zero (pinned by a planted negative
# differential test), and DuckDB's list_reduce replays the identical
# fold:
#
#     e_0 = x_0;  e_t = (15·x_t + 85·e_{t-1}) div 100      (α = 0.15)
#
# Scale note: the certification form folds each series inside one row
# (array_agg per series) — bounded by series length, which is fine for
# per-entity series (a user's events, a device's readings) and the
# 5-series fixture, but NOT for one giant global series.  The
# production path for unbounded series is chunked float folding with
# per-chunk carry (EWMA is a linear recurrence, so chunk results
# compose), traded against exactness — integer division is not
# associative, so the exact form is inherently sequential.  This is the
# documented reason the cert keeps the fold per-series-bounded.

EWMA_A_NUM, EWMA_A_DEN = 15, 100  # α = 0.15 on the integer grid

_EWMA_SQL = f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_points,
       list_reduce(
         array_agg(CAST(ROUND(value * 100) AS BIGINT) ORDER BY ts, event_id),
         (acc, x) -> ({EWMA_A_NUM} * x + {100 - EWMA_A_NUM} * acc) // {EWMA_A_DEN}
       ) AS ewma_x100
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@_register_standalone("ts_ewma", _EWMA_SQL)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final integer-grid EWMA per event-type series.

    One groupBy shuffle builds the ordered per-series array
    (sort_array over (ts, event_id, x) structs — (ts, event_id) is a
    total order, so both engines fold the identical sequence), then the
    fold runs element-by-element inside ``aggregate`` with the first
    element as the seed (matching DuckDB ``list_reduce`` semantics).
    Division semantics agree for ALL signs: Spark's integer ``div``
    and DuckDB's integer ``//`` BOTH truncate toward zero (DuckDB
    floors only for floating-point operands — verified, and pinned
    for negative values and sign-crossing intermediates by
    ``test_ewma_fold_integer_division_matches_duckdb_on_negatives``),
    so negative event values need no special-casing.  The 2-dp value
    grid makes ROUND(value·100) exact on both engines (grid-landing
    class, not floor class).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("x"),
    )
    arr = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "x"))),
            lambda s: s.x,
        ).alias("xs"),
    )
    fold = F.expr(
        f"aggregate(slice(xs, 2, size(xs) - 1), xs[0],"
        f" (acc, x) -> ({EWMA_A_NUM} * x + {100 - EWMA_A_NUM} * acc)"
        f" div {EWMA_A_DEN})"
    )
    return arr.select(
        "event_type", "n_points", fold.alias("ewma_x100")
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Sweep-line interval concurrency
# --------------------------------------------------------------------------
#
# "How many X are active at once" — the classic interval-overlap
# aggregation (peak concurrent sessions, simultaneous jobs, live
# connections).  The naive form joins every interval against every
# instant (quadratic); the sweep line is the scalable rewrite: each
# interval contributes a +1 at its start and a -1 at its end, deltas
# merge per distinct boundary instant, and a running sum over the sorted
# boundaries IS the concurrency profile.  Semantics are closed-open
# [s, e): at an instant where one interval ends and another begins, the
# merged delta nets to zero (the continuing count is correct), and
# zero-length intervals contribute nothing — deterministic and
# engine-identical, so the oracle is the same portable text.
#
# Scale: intervals here are per (user, day) activity spans (one groupBy
# of the fact); the sweep shuffles only the 2·|intervals| boundary
# points, the running sum partitions by day (the natural parallelism
# unit — no global sort), and the final max is a per-day aggregate.
# |boundaries| ≪ |events| by construction at any scale.

_CONCURRENCY_SQL = """
WITH iv AS (
  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
         MIN(CAST(ts AS TIMESTAMP)) AS s, MAX(CAST(ts AS TIMESTAMP)) AS e
  FROM events GROUP BY 1, 2
),
pts AS (
  SELECT d, s AS t, 1 AS delta FROM iv WHERE s < e
  UNION ALL
  SELECT d, e AS t, -1 AS delta FROM iv WHERE s < e
),
sw AS (SELECT d, t, SUM(delta) AS dsum FROM pts GROUP BY d, t),
run AS (SELECT d, t, SUM(dsum) OVER (PARTITION BY d ORDER BY t) AS concurrent
        FROM sw)
SELECT d, CAST(MAX(concurrent) AS BIGINT) AS max_concurrent,
       CAST(COUNT(*) AS BIGINT) AS n_boundaries
FROM run GROUP BY d ORDER BY d
"""


@_register_standalone("ts_concurrency", _CONCURRENCY_SQL)
def ts_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent active users per day via the sweep line
    (identical portable SQL on both engines through the text surface)."""
    from data_ingestion_backend_spark.plans.catalog import run_sql

    return run_sql(spark, sf_dir, _CONCURRENCY_SQL)
