"""Error-bound contracts for the sketch operators (no SQL oracle exists:
engines implement different approximation algorithms — the bound IS the
spec a production user relies on)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.sketches import (
    approx_user_counts,
    approx_value_quantiles,
)
from data_ingestion_backend_spark.sources.fixtures import load_table
from tests.conftest import SF_DIR_ORACLE


def test_hll_within_error_bound(spark):
    exact = {
        r["event_type"]: r["u"]
        for r in load_table(spark, SF_DIR_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    for r in approx_user_counts(spark, SF_DIR_ORACLE).collect():
        e = exact[r["event_type"]]
        # 2% rsd → allow 4 sigma ≈ 8%
        assert abs(r["approx_users"] - e) <= max(0.08 * e, 2), (r, e)


def test_quantiles_within_rank_error(spark):
    ev = load_table(spark, SF_DIR_ORACLE, "events").cache()
    approx = {
        r["event_type"]: r["quantiles"]
        for r in approx_value_quantiles(spark, SF_DIR_ORACLE).collect()
    }
    for etype, (p50, p95, p99) in approx.items():
        vals = sorted(
            x["value"]
            for x in ev.filter(F.col("event_type") == etype).select("value").collect()
        )
        n = len(vals)

        def rank_of(v):
            return sum(1 for x in vals if x <= v) / n

        # GK guarantee: rank error ≤ 1/accuracy (=0.1%); allow slack ×5
        assert abs(rank_of(p50) - 0.5) <= 0.005
        assert abs(rank_of(p95) - 0.95) <= 0.005
        assert abs(rank_of(p99) - 0.99) <= 0.005


# --- distributed Bloom gate --------------------------------------------------

def test_bloom_no_false_negatives_and_fp_bound(spark):
    from data_ingestion_backend_spark.operators.sketches import (
        BLOOM_BITS,
        BLOOM_K,
        sketch_bloom_gate,
    )

    rows = sketch_bloom_gate(spark, SF_DIR_ORACLE).collect()
    members = [r for r in rows if r["kind"] == "member"]
    nonmembers = [r for r in rows if r["kind"] == "nonmember"]
    assert members and nonmembers
    # the Bloom guarantee: NEVER a false negative
    assert all(r["might_contain"] for r in members)
    # false positives bounded by (set_bits/m)^k with generous slack; at
    # 500 docs × 4 hashes in 2^20 bits the expected rate is ~1e-11, so
    # even 1% would indicate broken bit arithmetic
    fp = sum(1 for r in nonmembers if r["might_contain"]) / len(nonmembers)
    expected = (len(members) * BLOOM_K / BLOOM_BITS) ** BLOOM_K
    assert fp <= max(0.01, expected * 100)


def test_bloom_merge_is_union(spark):
    from pyspark.sql import functions as F

    from data_ingestion_backend_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    a = spark.createDataFrame([("x1",), ("x2",)], "h string")
    b = spark.createDataFrame([("y1",), ("y2",)], "h string")
    merged = bloom_build(a, "h").unionByName(bloom_build(b, "h")).distinct()
    probes = spark.createDataFrame(
        [("x1", "a"), ("y2", "b"), ("z9", "neither")], "h string, tag string"
    )
    out = {
        r["tag"]: r["might_contain"]
        for r in bloom_might_contain(probes, "h", merged).collect()
    }
    assert out["a"] and out["b"]
    assert not out["neither"]  # 3e-23 fp odds at 16 set bits in 2^20


# --------------------------------------------------------------------------
# Count-Min sketch properties
# --------------------------------------------------------------------------

def test_cm_never_underestimates(spark):
    """The one-sided CM guarantee, for EVERY key: est >= exact count."""
    from data_ingestion_backend_spark.operators.sketches import (
        cm_build,
        cm_estimate,
    )

    ev = load_table(spark, SF_DIR_ORACLE, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    counters = cm_build(ev, "k")
    exact = ev.groupBy("k").agg(F.count("*").alias("exact"))
    joined = cm_estimate(exact, "k", counters).collect()
    assert joined
    assert all(r["est"] >= r["exact"] for r in joined)


def test_cm_counter_mass_conservation(spark):
    """Each depth row's cells sum to exactly N (every input row lands in
    exactly one cell per depth) — a deterministic invariant the
    probabilistic error bound rests on."""
    from data_ingestion_backend_spark.operators.sketches import (
        CM_DEPTH,
        cm_build,
    )

    ev = load_table(spark, SF_DIR_ORACLE, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    n = ev.count()
    per_depth = (
        cm_build(ev, "k").groupBy("depth").agg(F.sum("cnt").alias("mass"))
    ).collect()
    assert len(per_depth) == CM_DEPTH
    assert all(r["mass"] == n for r in per_depth)


def test_cm_merge_equals_rebuild(spark):
    """Sum-merging two partial sketches (the 100 TB shape: one sketch per
    shard, merged cell-wise) is bit-identical to one build over the
    union."""
    from data_ingestion_backend_spark.operators.sketches import cm_build

    ev = load_table(spark, SF_DIR_ORACLE, "events").select(
        "event_id", F.col("user_id").cast("string").alias("k")
    )
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    merged = (
        cm_build(a, "k")
        .unionByName(cm_build(b, "k"))
        .groupBy("depth", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = cm_build(ev, "k")
    sym_diff = merged.exceptAll(full).unionByName(full.exceptAll(merged))
    assert sym_diff.count() == 0


def test_cm_weighted_build(spark):
    """Weighted increments: sketch of SUM(weight) per key, same grid."""
    from data_ingestion_backend_spark.operators.sketches import (
        cm_build,
        cm_estimate,
    )

    df = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 1)], "k string, w int"
    )
    counters = cm_build(df, "k", weight="w")
    est = {
        r["k"]: r["est"]
        for r in cm_estimate(
            df.select("k").distinct(), "k", counters
        ).collect()
    }
    assert est["a"] >= 12 and est["b"] >= 1


def test_cm_build_uses_partial_aggregation(spark):
    """The counter build must plan partial (map-side) aggregation so
    each map task emits at most D*W rows — the property that makes the
    sketch corpus-size-independent."""
    from data_ingestion_backend_spark.operators.sketches import cm_build
    from data_ingestion_backend_spark.sources.fixtures import load_table

    ev = load_table(spark, SF_DIR_ORACLE, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    plan = cm_build(ev, "k")._jdf.queryExecution().executedPlan().toString()
    # two HashAggregates (partial + final) around one exchange
    assert plan.count("HashAggregate") >= 2, plan
    assert "partial_sum" in plan or "partial" in plan.lower(), plan


def test_bloom_prune_keys_superset_of_matches_and_actually_prunes(spark):
    """The pruned fact must (a) keep EVERY row whose key is in the build
    set — no false negatives means the downstream join result is exactly
    the plain join's — and (b) actually drop the bulk of non-matching
    rows, otherwise the gate costs K probes for nothing."""
    from data_ingestion_backend_spark.operators.scale import bloom_prune_keys
    from data_ingestion_backend_spark.operators.sketches import bloom_build

    build = spark.range(0, 200).select(
        F.col("id").cast("string").alias("h")
    )  # keys 0..199
    bits = bloom_build(build, "h")
    fact = spark.range(0, 5000).select(F.col("id").alias("k"))  # keys 0..4999
    pruned = bloom_prune_keys(fact, "k", bits)
    kept = {r["k"] for r in pruned.collect()}
    assert set(range(200)) <= kept, "bloom pruning dropped a matching key"
    # fp rate at 800 set bits / 2^20 is ~3e-13: essentially nothing else survives
    assert len(kept) <= 220, f"pruning ineffective: kept {len(kept)} of 5000"
