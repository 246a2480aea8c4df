"""Golden tests for the incremental-pipeline operators (operators/delta.py).

The differential oracles for ``cdc_snapshot_diff`` / ``scd2_user_history``
run in tests/test_oracle_queries.py::test_standalone_form_matches_oracle;
these tests pin the SEMANTIC contracts the hash comparison can't express:
status classes, interval contiguity, change compression, and the generic
(non-fixture) snapshot_diff entry point.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF_DIR_SMALL
from data_ingestion_backend_spark.operators.delta import (
    cdc_snapshot_diff,
    scd2_history,
    scd2_user_history,
    snapshot_diff,
)


def test_snapshot_diff_status_classes(spark):
    """Every diff status lands in exactly the key class that produced it:
    %10==3 added, %10==7 removed, %5==0 changed (when present in both)."""
    rows = cdc_snapshot_diff(spark, SF_DIR_SMALL).collect()
    assert rows, "diff must be non-empty"
    for r in rows:
        k = r["o_orderkey"]
        if r["status"] == "added":
            assert k % 10 == 3
            assert r["old_hash"] is None and r["new_hash"] is not None
        elif r["status"] == "removed":
            assert k % 10 == 7
            assert r["old_hash"] is not None and r["new_hash"] is None
        else:
            assert r["status"] == "changed"
            assert k % 5 == 0 and k % 10 not in (3, 7)
            assert r["old_hash"] != r["new_hash"]
    statuses = {r["status"] for r in rows}
    assert statuses == {"added", "removed", "changed"}


def test_snapshot_diff_identical_snapshots_empty(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    assert snapshot_diff(df, df, "k").count() == 0


def test_snapshot_diff_generic_detects_single_change(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], ["k", "v"]
    )
    got = {
        r["k"]: r["status"] for r in snapshot_diff(old, new, "k").collect()
    }
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_scd2_intervals_contiguous_and_current(spark):
    """Per key: versions dense from 1, intervals chain exactly
    (valid_to == next valid_from), exactly one open interval, and no
    consecutive episodes share a value (change compression)."""
    out = scd2_user_history(spark, SF_DIR_SMALL).collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        assert sum(r["is_current"] for r in rows) == 1
        assert rows[-1]["is_current"] and rows[-1]["valid_to"] is None
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"], uid
            assert a["event_type"] != b["event_type"], "uncompressed episode"


def test_scd2_point_in_time_lookup(spark):
    """The SCD2 contract: state-at-T == the last change at or before T in
    the raw log (the query an interval table exists to answer)."""
    from data_ingestion_backend_spark.sources.fixtures import load_table

    ev = load_table(spark, SF_DIR_SMALL, "events")
    t = ev.agg(F.expr("percentile(cast(ts as double), 0.5)")).first()[0]
    probe = F.lit(t).cast("double")
    hist = scd2_history(ev, "user_id", "event_type", "ts", "event_id")
    via_hist = {
        r["user_id"]: r["event_type"]
        for r in hist.where(
            (F.col("valid_from").cast("double") <= probe)
            & (
                F.col("valid_to").isNull()
                | (F.col("valid_to").cast("double") > probe)
            )
        ).collect()
    }
    w_last = (
        ev.where(F.col("ts").cast("double") <= probe)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ),
        )
        .where(F.col("_rn") == 1)
    )
    via_log = {r["user_id"]: r["event_type"] for r in w_last.collect()}
    assert via_hist == via_log


def test_scd2_single_window_exchange(spark):
    """Both window passes must plan over ONE shuffle of the log on the
    key (same partitioning, compatible sort) — the operator's scale
    contract."""
    df = scd2_user_history(spark, SF_DIR_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange ")
    # one exchange for the windows + at most one for the presentation sort
    assert n_exchanges <= 2, plan


# --------------------------------------------------------------------------
# Incremental aggregate maintenance
# --------------------------------------------------------------------------

def _state(spark, rows):
    return spark.createDataFrame(rows, "k string, n long, mn long, mx long")


def test_merge_state_one_sided_keys_pass_through(spark):
    from data_ingestion_backend_spark.operators.delta import merge_keyed_state

    old = _state(spark, [("a", 2, 5, 9), ("b", 1, 3, 3)])
    new = _state(spark, [("b", 4, 1, 7), ("c", 1, 2, 2)])
    got = {
        r["k"]: (r["n"], r["mn"], r["mx"])
        for r in merge_keyed_state(
            old, new, "k", sums=("n",), mins=("mn",), maxs=("mx",)
        ).collect()
    }
    assert got == {"a": (2, 5, 9), "b": (5, 1, 7), "c": (1, 2, 2)}


def test_merge_state_is_associative_and_identity(spark):
    from data_ingestion_backend_spark.operators.delta import merge_keyed_state

    a = _state(spark, [("x", 1, 10, 10)])
    b = _state(spark, [("x", 2, 4, 12), ("y", 1, 1, 1)])
    c = _state(spark, [("y", 3, 0, 9)])
    empty = _state(spark, [])

    def merge(p, q):
        return merge_keyed_state(p, q, "k", sums=("n",), mins=("mn",), maxs=("mx",))

    def snap(df):
        return sorted(tuple(r) for r in df.collect())

    assert snap(merge(merge(a, b), c)) == snap(merge(a, merge(b, c)))
    assert snap(merge(a, empty)) == snap(a)


def test_incremental_merge_never_rescans_base_rows(spark):
    """The scale contract: the merged plan aggregates each event row
    exactly once (two disjoint filtered scans), then joins STATE — there
    is no join whose input is raw event rows."""
    from data_ingestion_backend_spark.operators.delta import (
        agg_incremental_merge,
    )

    plan = (
        agg_incremental_merge(spark, SF_DIR_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the full-outer merge join must sit ABOVE both aggregates
    join_pos = plan.find("FullOuter")
    assert join_pos != -1
    agg_positions = [
        i for i in range(len(plan)) if plan.startswith("HashAggregate", i)
    ]
    assert agg_positions and all(p > join_pos for p in agg_positions), (
        "aggregation must happen below (printed after) the merge join"
    )


# --------------------------------------------------------------------------
# Seeded randomized differentials vs pure-Python oracles
# --------------------------------------------------------------------------

def _random_table(rng, n_keys: int):
    rows = []
    for k in range(n_keys):
        if rng.random() < 0.8:  # some keys absent per snapshot
            rows.append((k, rng.choice("abcde"), rng.randrange(100)))
    return rows


def test_snapshot_diff_matches_python_oracle_random(spark):
    """3 seeded random snapshot pairs: Spark's diff == a dict-based
    reference diff (an algorithm with nothing in common with the plan)."""
    import random

    for seed in (7, 42, 1337):
        rng = random.Random(seed)
        old_rows = _random_table(rng, 60)
        new_rows = _random_table(rng, 60)
        old = spark.createDataFrame(old_rows, "k long, a string, b long")
        new = spark.createDataFrame(new_rows, "k long, a string, b long")
        got = {
            r["k"]: r["status"]
            for r in snapshot_diff(old, new, "k").collect()
        }
        o, n = {r[0]: r[1:] for r in old_rows}, {r[0]: r[1:] for r in new_rows}
        want = {}
        for k in set(o) | set(n):
            if k not in o:
                want[k] = "added"
            elif k not in n:
                want[k] = "removed"
            elif o[k] != n[k]:
                want[k] = "changed"
        assert got == want, f"seed {seed}"


def test_merge_state_matches_python_oracle_random(spark):
    """Seeded random state merges vs a dict fold."""
    import random

    from data_ingestion_backend_spark.operators.delta import merge_keyed_state

    for seed in (3, 99):
        rng = random.Random(seed)
        sides = []
        for _ in range(2):
            sides.append(
                [
                    (k, rng.randrange(1, 9), rng.randrange(100), rng.randrange(100))
                    for k in range(40)
                    if rng.random() < 0.7
                ]
            )
        a = spark.createDataFrame(sides[0], "k long, n long, mn long, mx long")
        b = spark.createDataFrame(sides[1], "k long, n long, mn long, mx long")
        got = {
            r["k"]: (r["n"], r["mn"], r["mx"])
            for r in merge_keyed_state(
                a, b, "k", sums=("n",), mins=("mn",), maxs=("mx",)
            ).collect()
        }
        want = {}
        for rows in sides:
            for k, n, mn, mx in rows:
                if k in want:
                    pn, pmn, pmx = want[k]
                    want[k] = (pn + n, min(pmn, mn), max(pmx, mx))
                else:
                    want[k] = (n, mn, mx)
        assert got == want, f"seed {seed}"


def test_snapshot_diff_pushes_filters_to_both_scans(spark):
    """Each snapshot's defining filter must reach its parquet scan
    (PushedFilters) — at 100 TB the diff reads two filtered scans, never
    two full scans plus in-memory filters."""
    plan = (
        cdc_snapshot_diff(spark, SF_DIR_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    nontrivial = [p for p in pushed if p.strip()]
    assert len(nontrivial) >= 2, plan[:2000]
