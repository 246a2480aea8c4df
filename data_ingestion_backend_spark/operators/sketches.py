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
