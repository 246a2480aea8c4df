"""Sketch operators: approximate distinct counts and quantiles.

At 100 TB, exact COUNT(DISTINCT) and exact percentiles are shuffle-heavy
(full repartition of the distinct keys / a global sort); the sketch forms
are single-pass, mergeable, and bounded-memory:

- ``approx_count_distinct`` — HyperLogLog++ (relative error configurable
  via ``rsd``; default 5%, here pinned tighter).
- ``percentile_approx`` — Greenwald-Khanna quantile summaries with an
  accuracy knob (rank error ≤ 1/accuracy).

No DuckDB oracle: both engines implement different approximation
algorithms, so values legitimately differ.  Certification is instead an
error-bound contract against the exact answers
(tests/test_sketches.py) — which is exactly the guarantee a user of the
sketch gets in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.queries import STANDALONE_QUERIES
from data_ingestion_backend_spark.sources.fixtures import load_table

HLL_RSD = 0.02          # ≤2% relative standard deviation
QUANTILE_ACCURACY = 1000  # rank error ≤ 0.1%


def approx_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type approximate distinct users + exact row counts.

    Single pass, map-side partial HLL sketches merged at the reducer —
    the distinct keys themselves are never shuffled.
    """
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("approx_users"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


def approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p95/p99 of `value` via GK summaries."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.percentile_approx(
                "value", [0.5, 0.95, 0.99], QUANTILE_ACCURACY
            ).alias("quantiles")
        )
        .orderBy("event_type")
    )


def sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both sketch families in ONE single-pass aggregation per event type:
    HLL distinct users, exact counts, and GK p50/p95/p99 — flattened to
    scalar columns (an array terminal would crash the driver's pandas
    canonicalizer; scalar doubles hash cleanly)."""
    q = F.percentile_approx("value", [0.5, 0.95, 0.99], QUANTILE_ACCURACY)
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("approx_users"),
            F.count("*").alias("n"),
            q.alias("_q"),
        )
        .select(
            "event_type",
            "approx_users",
            "n",
            F.round(F.col("_q")[0], 6).alias("p50"),
            F.round(F.col("_q")[1], 6).alias("p95"),
            F.round(F.col("_q")[2], 6).alias("p99"),
        )
        .orderBy("event_type")
    )


# LOCAL rows-only (approximation ⇒ no cross-engine oracle; the
# error-bound contract lives in tests/test_sketches.py).  A rows-only
# entry can never earn a driver hash, so it lives in the standalone
# registry and its former driver slot certifies an oracled operator.
STANDALONE_QUERIES["sketch_profile"] = sketch_profile


#: HLL certification tolerance: 3 standard deviations (rsd is a σ, not a
#: hard bound) plus absolute slack 2 for tiny groups where 3σ < 1 key.
_HLL_TOL_SIGMA = 3.0
#: GK rank-error guarantee: ε = 1/accuracy (Greenwald-Khanna contract)
_GK_EPS = 1.0 / QUANTILE_ACCURACY

_PROFILE_BOUNDS_ORACLE = """
SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS hll_ok, TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
FROM events GROUP BY event_type ORDER BY event_type
"""


def sketch_profile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bound-style certification of the sketch profile, as a gate row.

    Sketch values can't be cross-engine compared (Spark HLL++ / GK vs
    whatever DuckDB implements), but their ERROR CONTRACTS can: this
    query computes, inside Spark, both the sketch estimates and the
    exact answers, and emits per-series booleans asserting each estimate
    honors its published bound — |HLL − exact| ≤ 3σ·exact + 2, and each
    GK quantile's exact rank within ±ε·n of its target (ε = 1/accuracy,
    the Greenwald-Khanna guarantee; rank containment uses the value's
    [count(<v), count(≤v)] span so ties don't false-fail).  The DuckDB
    oracle recomputes the exact sides (n, exact distinct) and asserts
    the booleans TRUE — so a sketch drifting out of contract hash-fails
    the uniform differential gate exactly like a wrong-valued query.

    Shape note: the exact COUNT(DISTINCT) and the rank join-back exist
    FOR THE CERT — production uses ``sketch_profile`` (single pass, no
    distinct shuffle); this query is the certification twin.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "value"
    )
    prof = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("value", [0.5, 0.95, 0.99], QUANTILE_ACCURACY).alias(
            "_q"
        ),
    )
    j = ev.join(F.broadcast(prof), "event_type")
    ranked = j.groupBy("event_type").agg(
        *[
            agg
            for i in range(3)
            for agg in (
                F.sum(
                    (F.col("value") < F.col("_q")[i]).cast("long")
                ).alias(f"lt{i}"),
                F.sum(
                    (F.col("value") <= F.col("_q")[i]).cast("long")
                ).alias(f"le{i}"),
            )
        ],
        F.first("approx_users").alias("approx_users"),
        F.first("exact_users").alias("exact_users"),
        F.first("n").alias("n"),
    )
    hll_ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        <= _HLL_TOL_SIGMA * HLL_RSD * F.col("exact_users") + F.lit(2.0)
    )

    def rank_ok(i: int, q: float) -> F.Column:
        # the value's rank span [lt, le] must intersect [(q−ε)n, (q+ε)n]
        lo = F.floor((F.lit(q) - F.lit(_GK_EPS)) * F.col("n"))
        hi = F.ceil((F.lit(q) + F.lit(_GK_EPS)) * F.col("n"))
        return (F.col(f"le{i}") >= lo) & (F.col(f"lt{i}") <= hi)

    return (
        ranked.select(
            "event_type",
            "n",
            "exact_users",
            hll_ok.alias("hll_ok"),
            rank_ok(0, 0.5).alias("p50_ok"),
            rank_ok(1, 0.95).alias("p95_ok"),
            rank_ok(2, 0.99).alias("p99_ok"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Distributed Bloom filter: corpus-membership gate
# --------------------------------------------------------------------------
#
# The 100 TB incremental-ingest question — "have we already admitted this
# content hash?" — needs an index far smaller than the corpus that never
# false-NEGATIVES.  Spark's built-in BloomFilter (df.stat.bloomFilter /
# the internal bloom_filter_agg) materializes the whole filter on the
# driver and is JVM-opaque (no cross-engine oracle).  This form keeps the
# filter DISTRIBUTED — the set of set bit positions as a (bit BIGINT)
# table, buildable with one distinct-aggregation, mergeable by UNION, and
# probe-able with a hash join — and derives its K bit positions from md5
# arithmetic that Spark and DuckDB evaluate bit-identically, so the whole
# gate (build + probe) carries a differential oracle, false positives
# included.
#
# Unlike a flat bitmap, the bit-set table is proportional to the number
# of SET bits (≤ K·n_items), partitions uniformly (md5-derived positions),
# and the probe is a bits-sized hash join — at 100 TB: billions of items
# → a few GB of bit rows vs a corpus-sized anti-join on raw hashes.

BLOOM_BITS = 1 << 20  # m: filter width in bits
BLOOM_K = 4           # k: hash functions; fpp ≈ (set_bits/m)^k


def _bloom_bit(i: int, col: F.Column) -> F.Column:
    """Bit position i ∈ [0, K): first 15 md5 hex chars of 'i:value' as a
    BIGINT, mod m — the same cross-engine hash trick the minhash family
    pins (15 hex chars < 2^60 never overflows; md5 is the one hash both
    engines share)."""
    h = F.md5(F.concat(F.lit(f"{i}:"), col))
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % BLOOM_BITS
    )


def _bloom_bit_sql(i: int, expr: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{i}:' || {expr}), 1, 15)) AS BIGINT)"
        f" % {BLOOM_BITS}"
    )


def bloom_build(df: DataFrame, col: str) -> DataFrame:
    """Build the distributed filter over ``df[col]``: the distinct set of
    bit positions (one BIGINT column ``bit``).  One explode + one
    distinct-aggregation; merge two filters with unionByName+distinct."""
    bits = F.array(*[_bloom_bit(i, F.col(col)) for i in range(BLOOM_K)])
    return df.select(F.explode(bits).alias("bit")).distinct()


def bloom_might_contain(
    probes: DataFrame, col: str, bits: DataFrame, keep: list[str] | None = None
) -> DataFrame:
    """Membership verdict per probe row: TRUE iff ALL K bit positions of
    ``probes[col]`` are present in ``bits`` (never a false negative; false
    positives at the documented (set_bits/m)^k rate).  Shape: explode K
    probe rows → hash join on bit → require K hits."""
    keep = keep if keep is not None else [c for c in probes.columns if c != col]
    exploded = probes.select(
        *keep,
        F.explode(
            F.array(*[_bloom_bit(i, F.col(col)) for i in range(BLOOM_K)])
        ).alias("bit"),
    )
    hit = bits.withColumn("_present", F.lit(1))
    return (
        exploded.join(hit, "bit", "left")
        .groupBy(*keep)
        .agg((F.sum(F.coalesce(F.col("_present"), F.lit(0))) == BLOOM_K).alias(
            "might_contain"
        ))
    )


def _bloom_gate_oracle() -> str:
    member_bits = " UNION ALL ".join(
        f"SELECT {_bloom_bit_sql(i, 'h')} AS bit FROM members"
        for i in range(BLOOM_K)
    )
    probe_bits = " UNION ALL ".join(
        f"SELECT probe_id, kind, {_bloom_bit_sql(i, 'h')} AS bit FROM probes"
        for i in range(BLOOM_K)
    )
    return f"""
WITH members AS (SELECT md5(text) AS h FROM documents),
bits AS (SELECT DISTINCT bit FROM ({member_bits})),
probes AS (
  SELECT doc_id AS probe_id, 'member' AS kind, md5(text) AS h FROM documents
  UNION ALL
  SELECT doc_id, 'nonmember',
         md5('synthetic:' || CAST(doc_id AS VARCHAR)) FROM documents
),
ph AS ({probe_bits}),
hits AS (
  SELECT p.probe_id, p.kind, COUNT(b.bit) AS k_hits
  FROM ph p LEFT JOIN bits b ON b.bit = p.bit
  GROUP BY p.probe_id, p.kind
)
SELECT probe_id, kind, (k_hits = {BLOOM_K}) AS might_contain
FROM hits ORDER BY probe_id, kind"""


def sketch_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-certified end-to-end Bloom gate: build the filter
    over the corpus content hashes, then probe it with every member hash
    (must all pass — the no-false-negative guarantee, hash-checked) and
    one synthetic non-member hash per doc (almost all fail; any false
    positive is REPRODUCED bit-for-bit by the oracle because the bit
    arithmetic is engine-independent)."""
    docs = load_table(spark, sf_dir, "documents")
    members = docs.select(F.md5(F.col("text")).alias("h"))
    bits = bloom_build(members, "h")
    probes = docs.select(
        F.col("doc_id").alias("probe_id"),
        F.lit("member").alias("kind"),
        F.md5(F.col("text")).alias("h"),
    ).unionByName(
        docs.select(
            F.col("doc_id").alias("probe_id"),
            F.lit("nonmember").alias("kind"),
            F.md5(
                F.concat(F.lit("synthetic:"), F.col("doc_id").cast("string"))
            ).alias("h"),
        )
    )
    return (
        bloom_might_contain(probes, "h", bits, keep=["probe_id", "kind"])
        .orderBy("probe_id", "kind")
    )


from data_ingestion_backend_spark.operators.queries import (  # noqa: E402
    _register_standalone,
)

_register_standalone("sketch_bloom_gate", _bloom_gate_oracle())(sketch_bloom_gate)
_register_standalone("sketch_profile_bounds", _PROFILE_BOUNDS_ORACLE)(
    sketch_profile_bounds
)


# --------------------------------------------------------------------------
# Distributed Count-Min sketch: frequency estimates / heavy hitters
# --------------------------------------------------------------------------
#
# The 100 TB frequency question — "which keys are hot, and roughly how
# hot?" — must not shuffle the keys themselves: an exact groupBy on a
# billions-of-keys column moves the whole key space.  Count-Min compresses
# to a D×W counter grid: each row increments D md5-derived cells; a key's
# estimate is the MIN over its D cells (never an underestimate, over by
# ≤ εN with ε = e/W at probability 1-(1/2)^D).  Like the Bloom filter
# above, the sketch is kept DISTRIBUTED as a (depth, pos, cnt) table —
# built with one map-side-combined aggregation of at most D·W rows per
# partition, merged by summing cell-wise, probed with a join — and the
# md5 arithmetic is engine-identical, so estimates INCLUDING collision
# overestimates carry a DuckDB oracle.
#
# The same grid with weighted increments is a Count-Min of a measure
# (bytes per domain, tokens per source); cm_build takes an optional
# weight column for that form.

CM_WIDTH = 256  # W: cells per depth row (small enough that the fixture
                # actually collides — overestimates are exercised, not
                # just theoretical)
CM_DEPTH = 3    # D: independent hash rows


def _cm_pos(d: int, col: F.Column) -> F.Column:
    """Cell position for depth d — same md5→BIGINT trick as the Bloom
    bits (15 hex chars < 2^60; both engines bit-identical)."""
    h = F.md5(F.concat(F.lit(f"cm{d}:"), col))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % CM_WIDTH


def _cm_pos_sql(d: int, expr: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('cm{d}:' || {expr}), 1, 15)) AS BIGINT)"
        f" % {CM_WIDTH}"
    )


def cm_build(df: DataFrame, col: str, weight: str | None = None) -> DataFrame:
    """Build the counter table (depth INT, pos BIGINT, cnt BIGINT) over
    ``df[col]`` (each row counts 1, or its ``weight``).  One posexplode +
    one aggregation; partial aggregation caps every map task's output at
    D·W rows.  Merge two sketches by unioning and re-summing by
    (depth, pos)."""
    w = F.col(weight).cast("bigint") if weight else F.lit(1).cast("bigint")
    cells = F.array(*[_cm_pos(d, F.col(col)) for d in range(CM_DEPTH)])
    return (
        df.select(F.posexplode(cells).alias("depth", "pos"), w.alias("_w"))
        .groupBy("depth", "pos")
        .agg(F.sum("_w").alias("cnt"))
    )


def cm_estimate(probes: DataFrame, col: str, counters: DataFrame) -> DataFrame:
    """Point estimate per probe row: MIN over the D probed cells (a cell
    absent from the counter table is 0).  Keeps all probe columns."""
    keep = [c for c in probes.columns]
    cells = F.array(*[_cm_pos(d, F.col(col)) for d in range(CM_DEPTH)])
    exploded = probes.select(*keep, F.posexplode(cells).alias("depth", "pos"))
    return (
        exploded.join(counters, ["depth", "pos"], "left")
        .groupBy(*keep)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def _cm_oracle() -> str:
    counter_rows = " UNION ALL ".join(
        f"SELECT {d} AS depth, {_cm_pos_sql(d, 'CAST(user_id AS VARCHAR)')} AS pos"
        f" FROM events"
        for d in range(CM_DEPTH)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT user_id, {d} AS depth,"
        f" {_cm_pos_sql(d, 'CAST(user_id AS VARCHAR)')} AS pos FROM keys"
        for d in range(CM_DEPTH)
    )
    return f"""
WITH counters AS (
  SELECT depth, pos, COUNT(*) AS cnt FROM ({counter_rows}) GROUP BY depth, pos
),
keys AS (SELECT DISTINCT user_id FROM events),
probed AS ({probe_rows}),
est AS (
  SELECT p.user_id, MIN(COALESCE(c.cnt, 0)) AS est
  FROM probed p LEFT JOIN counters c ON c.depth = p.depth AND c.pos = p.pos
  GROUP BY p.user_id
),
exact AS (SELECT user_id, COUNT(*) AS exact FROM events GROUP BY user_id)
SELECT e.user_id, e.est, x.exact, e.est - x.exact AS overcount
FROM est e JOIN exact x ON x.user_id = e.user_id
ORDER BY e.est DESC, e.user_id LIMIT 20"""


@_register_standalone("sketch_cm_heavy_hitters", _cm_oracle())
def sketch_cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by Count-Min estimate, with the exact count and the
    collision overcount alongside — the overestimates are part of the
    certified answer (both engines compute the identical grid), which is
    what makes this a DIFFERENTIAL cert of an approximate structure.

    The exact join exists for certification; the production form stops at
    ``cm_estimate`` (the whole point is not to compute ``exact``)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k"), "user_id"
    )
    counters = cm_build(ev, "k")
    keys = ev.select("user_id", "k").distinct()
    est = cm_estimate(keys, "k", counters).select("user_id", "est")
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("exact"))
    )
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "est",
            "exact",
            (F.col("est") - F.col("exact")).alias("overcount"),
        )
        .orderBy(F.col("est").desc(), "user_id")
        .limit(20)
    )
