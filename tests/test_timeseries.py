"""Golden tests for the time-series operators (timeseries.py).

The DuckDB differential gate (test_oracle_queries) proves cross-engine
equality; these tests prove the *semantics* are non-degenerate — that the
fixture actually exercises interpolation, that interpolated points lie
between their neighbours, and that grouping-set tiers are mutually
consistent.
"""

from __future__ import annotations

import pytest

from data_ingestion_backend_spark.operators.timeseries import (
    agg_grouping_sets,
    ts_event_gaps,
    ts_gapfill_hourly,
)
from tests.conftest import SF_DIR_ORACLE


@pytest.fixture(scope="module")
def gapfill_rows(spark):
    return ts_gapfill_hourly(spark, SF_DIR_ORACLE).collect()


def test_gapfill_dense_spine(gapfill_rows):
    # Every series covers its full [min, max] hour range with no holes
    # and no duplicate hours.
    by_series: dict[str, list] = {}
    for r in gapfill_rows:
        by_series.setdefault(r.event_type, []).append(r.hr)
    for hrs in by_series.values():
        assert len(set(hrs)) == len(hrs)
        span_hours = int((max(hrs) - min(hrs)).total_seconds() // 3600) + 1
        assert len(hrs) == span_hours


def test_gapfill_actually_interpolates(gapfill_rows):
    # The sf0.01 events fixture has missing hours in every series — if
    # this fails the fixture degenerated and the oracle gate proves
    # nothing about interpolation.
    gaps = [r for r in gapfill_rows if r.is_gap == 1]
    assert len(gaps) > 50
    assert all(r.v_filled is not None for r in gapfill_rows)


def test_gapfill_interpolation_between_neighbours(gapfill_rows):
    # Each filled value lies within [min, max] of the nearest observed
    # neighbours — a property of linear interpolation that survives the
    # rounding on the terminal column.
    by_series: dict[str, list] = {}
    for r in sorted(gapfill_rows, key=lambda r: (r.event_type, r.hr)):
        by_series.setdefault(r.event_type, []).append(r)
    eps = 1e-4
    for rows in by_series.values():
        for i, r in enumerate(rows):
            if r.is_gap == 0:
                continue
            prev = next(
                (x for x in reversed(rows[:i]) if x.is_gap == 0), None
            )
            nxt = next((x for x in rows[i + 1 :] if x.is_gap == 0), None)
            assert prev is not None and nxt is not None
            lo = min(prev.v_filled, nxt.v_filled) - eps
            hi = max(prev.v_filled, nxt.v_filled) + eps
            assert lo <= r.v_filled <= hi


def test_event_gaps_consistency(spark):
    rows = ts_event_gaps(spark, SF_DIR_ORACLE).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_gaps == r.n_events - 1
        if r.n_gaps > 0:
            assert r.max_gap_us >= r.avg_gap_us >= 0


def test_grouping_sets_tiers_consistent(spark):
    rows = agg_grouping_sets(spark, SF_DIR_ORACLE).collect()
    tiers = {}
    for r in rows:
        tiers.setdefault(r.gid, []).append(r)
    assert set(tiers) == {1, 6, 7}
    total = tiers[7][0]
    # Each tier's counts and sums roll up to the grand total.
    for gid in (1, 6):
        assert sum(r.n for r in tiers[gid]) == total.n
        assert sum(r.sum_qty for r in tiers[gid]) == total.sum_qty
    # NULL padding matches the tier's key set.
    for r in tiers[1]:
        assert r.l_returnflag is not None and r.l_linenumber is None
    for r in tiers[6]:
        assert r.l_linenumber is not None and r.l_returnflag is None


# --- z-score anomaly detection ----------------------------------------------

def test_zscore_planted_outlier_flagged_constant_series_skipped(spark):
    """A planted far-out point must be flagged; a constant series must
    produce NO rows (no std dev → no defined z-score) rather than
    NaN-flagging everything."""
    from data_ingestion_backend_spark.operators.timeseries import zscore_flags

    rows = [(i, "normal", 10.0 + (i % 3)) for i in range(60)]
    rows.append((999, "normal", 10_000.0))
    rows += [(1000 + i, "flat", 5.0) for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = zscore_flags(df).collect()
    flagged = {(r.event_id, r.event_type) for r in out}
    assert (999, "normal") in flagged, "planted outlier not flagged"
    assert all(t != "flat" for _, t in flagged), "constant series produced z rows"
    # the inlier spread (±1 around 10) must not be flagged
    assert all(eid == 999 for eid, t in flagged if t == "normal")


def test_zscore_fixture_rate_sane(spark):
    """On the exponential-ish fixture values the ≥3σ rate should be low
    but non-zero (the operator finds real tail mass, not noise)."""
    from data_ingestion_backend_spark.operators.timeseries import ts_anomaly_zscore
    from data_ingestion_backend_spark.sources.fixtures import load_table

    n_total = load_table(spark, SF_DIR_ORACLE, "events").count()
    out = ts_anomaly_zscore(spark, SF_DIR_ORACLE).collect()
    assert 0 < len(out) < 0.05 * n_total
    assert all(abs(r.zscore) >= 3.0 for r in out)


def test_mad_flags_masked_outliers_zscore_misses(spark):
    """The classic masking case: enough extreme points inflate the stddev
    until the parametric z-score flags NOTHING, while median/MAD (50%
    breakdown) flags them all — the property that justifies shipping both
    detectors."""
    from pyspark.sql import functions as F

    from data_ingestion_backend_spark.operators.timeseries import (
        MAD_C,
        MAD_THRESHOLD,
        zscore_flags,
    )

    rows = [(i, "s", 10.0 + (i % 3)) for i in range(50)]
    rows += [(900 + i, "s", 1000.0) for i in range(8)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")

    z_flagged = {r.event_id for r in zscore_flags(df).collect()}
    assert not z_flagged, f"masking broken: z-score flagged {z_flagged}"

    med = df.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5D)"), 6).alias("med")
    )
    dev = df.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(d, 0.5D)"), 6).alias("mad")
    )
    rz = F.round(F.lit(MAD_C) * (F.col("value") - F.col("med")) / F.col("mad"), 4)
    out = (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("mad") > 0)
        .withColumn("rz", rz)
        .filter(F.abs(F.col("rz")) >= MAD_THRESHOLD)
        .collect()
    )
    mad_flagged = {r.event_id for r in out}
    assert mad_flagged == {900 + i for i in range(8)}


def test_mad_fixture_rate_sane(spark):
    from data_ingestion_backend_spark.operators.timeseries import ts_anomaly_mad
    from data_ingestion_backend_spark.sources.fixtures import load_table

    n_total = load_table(spark, SF_DIR_ORACLE, "events").count()
    out = ts_anomaly_mad(spark, SF_DIR_ORACLE).collect()
    assert 0 < len(out) < 0.10 * n_total
    assert all(abs(r.rz) >= 3.5 for r in out)


def test_ewma_fold_integer_division_matches_duckdb_on_negatives(spark):
    """The EWMA recurrence agrees across engines for NEGATIVE values
    too: Spark's integer ``div`` and DuckDB's integer ``//`` BOTH
    truncate toward zero (DuckDB floors only for float operands, e.g.
    ``-7 // 2 = -3`` on integers).  Planted mixed-sign series (negative
    inputs AND sign-crossing intermediates) pin the agreement, and a
    flooring fold is shown to differ — so the test fails loudly if
    either engine ever changes its integer-division semantics."""
    import duckdb
    from pyspark.sql import functions as F
    from data_ingestion_backend_spark.operators.timeseries import (
        EWMA_A_DEN,
        EWMA_A_NUM,
    )

    series = {
        "neg": [-101, -7, -3000, 55, -1],
        "cross": [100, -100, 100, -100, 7],
        "posneg": [-1, -2, -3, -4, -5, 999],
    }
    rows = [(k, xs) for k, xs in series.items()]
    sdf = spark.createDataFrame(rows, "event_type string, xs array<bigint>")
    fold = F.expr(
        f"aggregate(slice(xs, 2, size(xs) - 1), xs[0],"
        f" (acc, x) -> ({EWMA_A_NUM} * x + {100 - EWMA_A_NUM} * acc)"
        f" div {EWMA_A_DEN})"
    )
    got = {
        r["event_type"]: r["e"]
        for r in sdf.select("event_type", fold.alias("e")).collect()
    }
    con = duckdb.connect()
    want = {}
    for k, xs in series.items():
        want[k] = con.execute(
            f"SELECT list_reduce($1::BIGINT[],"
            f" (acc, x) -> ({EWMA_A_NUM} * x + {100 - EWMA_A_NUM} * acc)"
            f" // {EWMA_A_DEN})",
            [xs],
        ).fetchone()[0]
    assert got == want
    # ...and the planted series genuinely exercises the sign branch: a
    # FLOORING fold differs, so agreement above isn't vacuous
    floorf = F.expr(
        f"aggregate(slice(xs, 2, size(xs) - 1), xs[0],"
        f" (acc, x) -> CAST(floor(({EWMA_A_NUM} * x + {100 - EWMA_A_NUM} * acc)"
        f" / CAST({EWMA_A_DEN} AS DOUBLE)) AS BIGINT))"
    )
    got_floor = {
        r["event_type"]: r["e"]
        for r in sdf.select("event_type", floorf.alias("e")).collect()
    }
    assert got_floor != want, "planted series never exercised the sign branch"
