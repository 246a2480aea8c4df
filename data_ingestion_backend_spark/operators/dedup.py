"""Deduplication operators for LLM-data pipelines (SURVEY §2.10).

Six dedup families, all pure Catalyst expressions (no Python UDFs), each
with a dual-dialect DuckDB oracle where portable:

- **exact**      keep-first by content hash (the staging_row_hash pattern
                 generalized to documents).
- **MinHash-LSH** shingle → minhash signature → banded buckets → candidate
                 pairs → exact-Jaccard verification.  The scale path: only
                 bucket-colliding pairs are ever verified.
- **SimHash**    64-bit-ish (60-bit) bit-vote fingerprint; near-dup pairs
                 via chunk banding + Hamming distance.
- **n-gram Jaccard** inverted-index pair join with document-frequency
                 pruning (rare-shingle blocking) — exact similarities
                 without LSH approximation.
- **embedding**  cosine near-dup over vectors (top-k most-similar pairs;
                 brute force here, LSH-bucketed variant in similarity.py).
- **winnowing**  rolling-hash fingerprints (per-window k-gram-hash minima,
                 MOSS-style) → PARTIAL-overlap pairs — copied passages,
                 not just near-identical whole documents.

Portability pins shared by Spark and DuckDB texts:
- integer shingle hash = CAST(first-8-hex-chars(md5(s)) AS BIGINT) — both
  engines agree bit-for-bit (md5 is the only cross-engine hash).
- minhash_j = (a_j * H + b_j) mod P with P=4294967311 (prime > 2^32) and
  a_j,b_j < 2^30 seeded constants → products < 2^62, no BIGINT overflow.
- all ratios rounded to a fixed scale before comparison/ranking, with
  full key tiebreaks, so both engines rank identically.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from data_ingestion_backend_spark.plans.localtable import local_df
from data_ingestion_backend_spark.operators.queries import (
    _register,
    _register_standalone,
)
from data_ingestion_backend_spark.sources.fixtures import load_table

# --- shared constants (baked into BOTH dialect texts) -----------------------

MINHASH_P = 4294967311  # smallest prime > 2^32
_rng = random.Random(42)
MINHASH_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, 1 << 30), _rng.randrange(0, 1 << 30)) for _ in range(16)
]
N_BANDS, BAND_ROWS = 4, 4  # 16 = 4 bands × 4 rows; s-curve knee ≈ 0.71
JACCARD_THRESHOLD = 0.8
SIMHASH_BITS = 60  # 15 hex chars of md5 → fits BIGINT
SIMHASH_CHUNKS, SIMHASH_CHUNK_BITS = 4, 15
HAMMING_MAX = 6
NGRAM_MAX_DF = 5  # inverted-index pruning: ignore shingles in > 5 docs


# --- session-scoped persist memo --------------------------------------------
#
# The dedup family shares expensive intermediates (the shingle explode, the
# minhash per-doc table, the SimHash signature, winnowing fingerprints).
# Each entry point used to call .persist() on a freshly-built DataFrame with
# an identical logical plan; Spark's CacheManager deduplicates the storage
# but logs "Asked to cache already cached data" on every re-registration —
# noisy in multi-query sessions (the bench sweep) and churny on re-persist.
# Memoize per (application, sf_dir, source-fingerprint, name) so each
# intermediate is built and persisted exactly once per session; every
# consumer gets the same handle.  Entries are tiny (DataFrame handles);
# storage is reclaimed when the session stops, so the dict is never a
# leak at data scale.  The SOURCE FINGERPRINT (mtime+size of the entries
# under sf_dir) is part of the key: a pipeline that rewrites parquet
# under a memoized path mid-session gets a fresh build — the previous
# entry is unpersisted on detection, so the stale-cache trap Spark's own
# CacheManager has for re-persisted identical plans cannot occur here.
# (On an object store / real deployment the fingerprint is the snapshot
# version — the warehouse layer's versioned writes give it for free.)

_PERSIST_MEMO: dict[tuple[str, str, str], tuple[str, DataFrame]] = {}

#: append-only (name, "hit"|"build") event log — lets the bench harness
#: annotate which timed entries reuse session-persisted intermediates
#: (r14 bench-honesty item): a "hit" during a timed run means part of
#: that entry's steady-state number is a MEMORY_AND_DISK cache read, not
#: the operator.  Driver-side list of short tuples; never a data cost.
_MEMO_EVENTS: list[tuple[str, str]] = []


def _source_fingerprint(sf_dir: str) -> str:
    """Cheap change-detector for the fixture dir: (name, mtime_ns, size)
    of each entry plus one level of children for directory tables.  A
    handful of stats on the driver — never a data read."""
    import os

    parts: list[str] = []
    try:
        for entry in sorted(os.listdir(sf_dir)):
            p = os.path.join(sf_dir, entry)
            st = os.stat(p)
            parts.append(f"{entry}:{st.st_mtime_ns}:{st.st_size}")
            if os.path.isdir(p):
                for child in sorted(os.listdir(p)):
                    cst = os.stat(os.path.join(p, child))
                    parts.append(f"{entry}/{child}:{cst.st_mtime_ns}:{cst.st_size}")
    except OSError:
        return "unstat-able"
    return ";".join(parts)


def _session_persisted(spark, sf_dir, name, build):
    key = (spark.sparkContext.applicationId, sf_dir, name)
    fp = _source_fingerprint(sf_dir)
    hit = _PERSIST_MEMO.get(key)
    if hit is not None and hit[0] == fp:
        _MEMO_EVENTS.append((name, "hit"))
        return hit[1]
    if hit is not None:
        hit[1].unpersist()  # source rewritten mid-session: drop stale cache
    _MEMO_EVENTS.append((name, "build"))
    df = build().persist(StorageLevel.MEMORY_AND_DISK)
    _PERSIST_MEMO[key] = (fp, df)
    return df


# --- shingling (shared shapes) ----------------------------------------------

_SHINGLES_SQL = """
  CASE WHEN len(string_split(lower(text), ' ')) >= 3
       THEN list_distinct(list_transform(
              range(1, greatest(len(string_split(lower(text), ' ')) - 1, 1)),
              i -> string_split(lower(text), ' ')[i] || ' ' ||
                   string_split(lower(text), ' ')[i+1] || ' ' ||
                   string_split(lower(text), ' ')[i+2]))
       ELSE [lower(text)] END
"""


def docs_shingled_frame(docs: DataFrame) -> DataFrame:
    """Distinct 3-gram shingles for any (doc_id, text) frame.

    Two-step projection (tokens column, then shingle transform over it)
    instead of one nested expression: inlining split() into every lambda
    element access made Catalyst re-split the text per shingle element —
    measured 13× slower (7.0s → 0.54s for the sf0.1 shingle explode).
    """
    toks = docs.select(
        "doc_id",
        F.lower(F.col("text")).alias("ltext"),
        F.split(F.lower(F.col("text")), " ").alias("t"),
    )
    shingles = F.array_distinct(
        F.when(
            F.size(F.col("t")) >= 3,
            F.expr(
                "transform(sequence(0, size(t)-3),"
                " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
            ),
        ).otherwise(F.array(F.col("ltext")))
    )
    return toks.select("doc_id", F.explode(shingles).alias("s"))


def _docs_shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return docs_shingled_frame(load_table(spark, sf_dir, "documents"))


#: switch to the exploded verify join when a doc's distinct-shingle set
#: exceeds this (≈ a 50k-word document): the array form's per-doc row is
#: O(|shingle set|) wide, and book-length docs make rows multi-MB — a
#: task-memory hazard the row-sized exploded form doesn't have.
VERIFY_EXPLODE_OVER = 50_000

#: max(n) probe results per per-doc DataFrame HANDLE — the session-
#: memoized per-doc table is one handle reused by every dedup query in a
#: session, so the probe job runs once, not once per verify call.  The
#: strong reference keeps id() from aliasing a collected frame.  BOUNDED:
#: callers that build a fresh frame per call (streaming batches) would
#: otherwise pin every dead frame — and its localCheckpoint blocks — for
#: the session lifetime; insertion-order eviction keeps only the newest
#: handles (streaming callers should pass ``max_n`` explicitly anyway,
#: see ``dedup_incremental_pairs``).
_VERIFY_PROBE_MEMO: dict[int, tuple[DataFrame, int]] = {}
_VERIFY_PROBE_MEMO_CAP = 4


def _max_shingle_count(per_doc: DataFrame) -> int:
    hit = _VERIFY_PROBE_MEMO.get(id(per_doc))
    if hit is not None and hit[0] is per_doc:
        return hit[1]
    v = per_doc.agg(F.max("n")).collect()[0][0] or 0
    while len(_VERIFY_PROBE_MEMO) >= _VERIFY_PROBE_MEMO_CAP:
        _VERIFY_PROBE_MEMO.pop(next(iter(_VERIFY_PROBE_MEMO)))
    _VERIFY_PROBE_MEMO[id(per_doc)] = (per_doc, v)
    return v


def _verify_jaccard(
    per_doc: DataFrame,
    pairs: DataFrame,
    threshold: float | None,
    max_n: int | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs, from per-doc arrays.

    ``per_doc`` carries each document's distinct-shingle array + size, so
    verification is two hash joins on the (small) per-doc table plus an
    ``array_intersect`` per surviving pair — candidates are the sparse
    output of LSH/inverted-index blocking, so the per-pair array work is
    negligible next to re-joining the exploded shingle table (which cost
    two extra full shingle pipelines before this rewrite).

    SIZE GUARD: the array form's row width is the document's distinct
    shingle count; past ``VERIFY_EXPLODE_OVER`` (book-length docs) those
    rows are multi-MB and threaten task memory, so the guard probes
    ``max(n)`` (an aggregate over the already-built per-doc table — one
    cheap job) and routes to :func:`_verify_jaccard_exploded`, which
    computes the identical Jaccard from row-sized exploded shingles
    (equality pinned by ``test_dedup_verify_paths``).  Callers that
    already know the bound (persisted index stats) pass ``max_n`` and
    skip the probe job entirely — both paths are bit-equal, so an
    over-estimate only changes the physical route, never the result.
    """
    if max_n is None:
        max_n = _max_shingle_count(per_doc)
    if max_n > VERIFY_EXPLODE_OVER:
        return _verify_jaccard_exploded(per_doc, pairs, threshold)
    a = per_doc.select(
        F.col("doc_id").alias("doc_a"), F.col("ss").alias("ssa"), F.col("n").alias("na")
    )
    b = per_doc.select(
        F.col("doc_id").alias("doc_b"), F.col("ss").alias("ssb"), F.col("n").alias("nb")
    )
    i = F.size(F.array_intersect("ssa", "ssb")).cast("double")
    jac = i / (F.col("na") + F.col("nb") - i)
    out = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"), jac.alias("_j"))
    )
    if threshold is not None:
        out = out.filter(F.col("_j") >= threshold)
    return out.drop("_j").orderBy("doc_a", "doc_b")


def _verify_jaccard_exploded(
    per_doc: DataFrame, pairs: DataFrame, threshold: float | None
) -> DataFrame:
    """Row-sized verify path for huge documents: intersection sizes come
    from joining each candidate pair against the EXPLODED shingle rows
    (pair ⋈ shingles(a) ⋈ shingles(b) on equal shingle → count), so no
    row is ever wider than one shingle.  Costs two exploded-shingle
    joins instead of two array lookups — the right trade exactly when
    the arrays stop fitting comfortably in task memory."""
    ex = per_doc.select("doc_id", F.explode("ss").alias("s"))
    inter = (
        pairs.join(ex.select(F.col("doc_id").alias("doc_a"), "s"), "doc_a")
        .join(ex.select(F.col("doc_id").alias("doc_b"), "s"), ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("double").alias("i"))
    )
    na = per_doc.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = per_doc.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    out = (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"i": 0.0})
        .join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"), jac.alias("_j"))
    )
    if threshold is not None:
        out = out.filter(F.col("_j") >= threshold)
    return out.drop("_j").orderBy("doc_a", "doc_b")


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

@_register(
    "dedup_exact",
    """SELECT doc_id, content_hash, is_first FROM (
         SELECT doc_id, md5(text) AS content_hash,
                ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
                  AS is_first
         FROM documents) t
       ORDER BY doc_id""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-partition on content hash, keep lowest doc_id.

    Scale: one shuffle on the 128-bit hash (uniform → skew-free); the
    window per hash group is O(group) and groups are tiny.
    """
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.md5(F.col("text")).alias("content_hash"))
        .withColumn("is_first", F.row_number().over(w) == 1)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def _minhash_base_ctes() -> str:
    """The shared sh → sig → bands CTE prefix (shingles, signatures, LSH
    band keys); composed by every oracle in the minhash family."""
    hash_expr = "CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)"
    mins = ",\n            ".join(
        f"min(({a} * {hash_expr} + {b}) % {MINHASH_P}) AS m{j}"
        for j, (a, b) in enumerate(MINHASH_COEFFS)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {c} AS band_idx, md5(concat_ws(',', "
        + ", ".join(f"m{c * BAND_ROWS + r}" for r in range(BAND_ROWS))
        + ")) AS band_key FROM sig"
        for c in range(N_BANDS)
    )
    return f"""
      sh AS (
        SELECT doc_id, unnest({_SHINGLES_SQL}) AS s FROM documents
      ),
      sig AS (
        SELECT doc_id,
            {mins}
        FROM sh GROUP BY doc_id
      ),
      bands AS (
        {band_selects}
      )"""


def _minhash_ctes() -> str:
    """Shared CTE chain ending in ``pairs`` (the thresholded near-dup pairs);
    reused by the pairs oracle and the cluster-closure oracle."""
    return f"""{_minhash_base_ctes()},
      cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y
          ON x.band_idx = y.band_idx AND x.band_key = y.band_key
         AND x.doc_id < y.doc_id
      ),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS i
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
        GROUP BY c.doc_a, c.doc_b
      ),
      pairs AS (
        SELECT i.doc_a, i.doc_b,
               round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 4) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= {JACCARD_THRESHOLD}
      )"""


def _minhash_oracle_sql() -> str:
    return (
        f"WITH {_minhash_ctes()} "
        "SELECT doc_a, doc_b, jaccard FROM pairs ORDER BY doc_a, doc_b"
    )


def _minhash_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized per-doc table: 16 minhash columns + the distinct
    shingle array (``ss``) + its size (``n``).  One groupBy builds the
    signatures AND the arrays (Spark re-executes common subplans that
    feed different aggregates — a second groupBy would re-run the whole
    shingle pipeline); every family member that needs per-doc shingle
    arrays (LSH verify, n-gram Jaccard verify) reads THIS frame."""
    return _session_persisted(
        spark,
        sf_dir,
        "minhash_per_doc",
        lambda: minhash_per_doc_frame(
            load_table(spark, sf_dir, "documents")
        ),
    )


def minhash_per_doc_frame(docs: DataFrame) -> DataFrame:
    """Per-doc signature/array table for any (doc_id, text) frame — the
    frame-based core of `_minhash_per_doc`, reused by the streaming
    near-dup gate to index each arriving micro-batch with the identical
    signature arithmetic the corpus index carries."""
    h = F.conv(F.substring(F.md5(F.col("s")), 1, 8), 16, 10).cast("bigint")
    return docs_shingled_frame(docs).groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * h + F.lit(b)) % MINHASH_P).alias(f"m{j}")
            for j, (a, b) in enumerate(MINHASH_COEFFS)
        ],
        F.collect_list("s").alias("ss"),
        F.count("*").alias("n"),
    )


def _band_table(per_doc: DataFrame) -> DataFrame:
    """LSH band table (doc_id, band_idx, band_key) from the per-doc
    signature frame — the persisted form of this IS the corpus dedup
    index (see ``dedup_incremental_pairs``)."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"m{c * BAND_ROWS + r}").cast("string")
                            for r in range(BAND_ROWS)
                        ],
                    )
                ).alias("band_key"),
            )
            for c in range(N_BANDS)
        ]
    )
    return per_doc.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", "b.band_idx", "b.band_key"
    )


@_register("dedup_minhash_lsh", _minhash_oracle_sql())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup detection with exact-Jaccard verification.

    Pipeline: EXACT-duplicate groups short-circuit first (see
    :func:`minhash_pairs_short_circuit`), then distinct 3-gram shingles
    → 16 minhashes (one pass, 16 partial min-aggregates over the
    exploded shingles — map-side combined) → 4 banded bucket keys →
    bucket self-join over GROUP REPRESENTATIVES emits candidate pairs →
    exact Jaccard on candidates → threshold → expand back to members.

    Scale: the only quadratic step is *within identical band buckets*;
    verification joins shingles for candidate pairs only.  AQE handles a
    hot bucket via skew-join splitting; shingle-hash shuffles are uniform.

    The per-doc signature/array table is session-memoized and persisted
    MEMORY_AND_DISK because three plan arms here (banding, verify-a,
    verify-b) plus the n-gram operator consume it.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    per_doc = _minhash_per_doc(spark, sf_dir)
    return minhash_pairs_short_circuit(
        docs, per_doc, max_n=_max_shingle_count(per_doc)
    )


def _banded_pairs(per_doc: DataFrame, max_n: int | None = None) -> DataFrame:
    """Plain per-member band/verify pair list over a per-doc signature
    frame — the LSH family's base plan, shared by the monolithic
    comparator and the adaptive fallback of
    :func:`minhash_pairs_short_circuit`."""
    bands = _band_table(per_doc)
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verify_jaccard(per_doc, cand, JACCARD_THRESHOLD, max_n=max_n)


def minhash_pairs_short_circuit(
    docs: DataFrame, per_doc: DataFrame, max_n: int | None = None
) -> DataFrame:
    """The full near-dup pair list with the EXACT-duplicate clique
    short-circuit (r10 verdict #4): group docs by md5(text) first; only
    one REPRESENTATIVE per exact-dup group enters banding and Jaccard
    verification, exact-group pairs emit from the group structure
    directly (their Jaccard is 1.0 by identity), and every verified
    representative pair expands to all member pairs — identical shingle
    sets give identical band keys AND identical Jaccard values, so the
    output pair set and values are bit-equal to banding every member
    (the graded oracle runs the full per-member plan and stays green).

    Why it matters at 100 TB: a planted k-clique of exact duplicates
    costs the naive plan k banded copies of the SAME shingle-heavy rows
    (k² band-bucket collisions × 4 bands, each verify join row carrying
    a full shingle ARRAY — the capstone's dominant 100x spill).  Here
    the clique contributes ONE representative to the heavy machinery;
    the still-quadratic member expansion is integer id joins over the
    verified pair list, whose volume is the OUTPUT's own size.

    ADAPTIVE (r11): the short-circuit is taken only when the exact-dup
    MASS is material — one tiny md5 aggregation (a control-plane
    scalar, the ``batch_max_n`` precedent) counts the docs the
    representative path would REMOVE from banding; below 1% of the
    corpus the possible saving is bounded by 1% of the heavy path's
    rows while the group/expand machinery costs ~5 extra shuffles
    outright, so the plain per-member plan is strictly the better plan
    (measured at sf0.1 natural corpus: the unconditional short-circuit
    ran ~3× the plain plan's wall; the planted-clique regime, where
    removal is ~99%, keeps the 8× spill cut)."""
    groups = docs.select("doc_id", F.md5("text").alias("h"))
    stats = (
        groups.groupBy("h")
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") - F.lit(1)).alias("removed"),
        )
        .collect()[0]
    )
    if (stats["removed"] or 0) * 100 < (stats["n"] or 0):
        return _banded_pairs(per_doc, max_n)
    w = Window.partitionBy("h")
    m = groups.withColumn("rep", F.min("doc_id").over(w)).select(
        "doc_id", "h", "rep"
    )
    # exact-group pairs: identical text → Jaccard exactly 1.0
    p, q = m.alias("p"), m.alias("q")
    intra = p.join(
        q,
        (F.col("p.h") == F.col("q.h"))
        & (F.col("p.doc_id") < F.col("q.doc_id")),
    ).select(
        F.col("p.doc_id").alias("doc_a"),
        F.col("q.doc_id").alias("doc_b"),
        F.lit(1.0).alias("jaccard"),
    )
    # representatives only through banding + verification
    reps = m.filter(F.col("doc_id") == F.col("rep")).select("doc_id")
    per_doc_rep = per_doc.join(reps, "doc_id")
    bands = _band_table(per_doc_rep)
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    rep_pairs = _verify_jaccard(per_doc_rep, cand, JACCARD_THRESHOLD, max_n=max_n)
    # expand each verified representative pair to all member pairs —
    # members inherit their representative's shingle set verbatim
    ma = m.select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("a"))
    mb = m.select(F.col("rep").alias("doc_b"), F.col("doc_id").alias("b"))
    expanded = (
        rep_pairs.join(ma, "doc_a")
        .join(mb, "doc_b")
        .select(
            F.least("a", "b").alias("doc_a"),
            F.greatest("a", "b").alias("doc_b"),
            "jaccard",
        )
    )
    return intra.unionByName(expanded).orderBy("doc_a", "doc_b")


#: truncate the CC loop's lineage every N rounds — the plan doubles per
#: round (labels AND frontier both reference the round's upd), so between
#: truncations it tops out at ~2^N nodes; 8 keeps the analyzer trivial
#: while shallow real-world components (2-4 rounds) never checkpoint.
_CC_CHECKPOINT_EVERY = 8

#: ``cc_incremental`` small-graph fast path: when the star-reduced graph
#: (old labels' stars + the batch's new pairs) holds at most this many
#: edges, the closure runs as a driver union-find over one bounded
#: collect instead of the distributed propagation rounds — the runtime
#: size decision AQE makes for broadcast joins, applied to the per-batch
#: job floor.  20k edges ≈ a few MB collected; a steady-state batch's
#: touched subgraph is hundreds of edges, and anything larger (bulk
#: migration, giant cluster merges) takes the distributed path.  0
#: disables the fast path (tests force the distributed arm through it).
CC_DRIVER_EDGE_LIMIT = 20_000


def connected_components(
    pairs: DataFrame,
    max_rounds: int = 50,
    und: DataFrame | None = None,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Distributed connected components by DELTA min-label propagation.

    ``pairs``: an undirected edge list with columns (doc_a, doc_b).
    Returns (doc_id, lbl) for every EDGE-CONNECTED node, where ``lbl``
    is the minimum node id of its component; nodes with no edges are
    absent (callers re-attach singletons as their own cluster).

    ``und``: optional prebuilt PERSISTED both-direction edge list with
    columns (a, b); ``nodes``: optional prebuilt PERSISTED distinct node
    set with column (doc_id).  Callers that run CC repeatedly in one
    session (the bench sweep) pass session-memoized frames to skip the
    per-call rebuild+persist+unpersist cycles; caller-supplied frames
    are left persisted on return.

    Round 1 pushes every node's self-label to its neighbors; every later
    round joins the edge list against ONLY the labels that changed last
    round — a node whose label did not change in round k already pushed
    that label in the round after it last changed, so its neighbors hold
    it, and the per-round join shrinks with the frontier.  Convergence
    needs O(component diameter) rounds; ``max_rounds`` is a safety bound,
    not a truncation — exceeding it RAISES, because labels past the bound
    would be silently wrong (a fixpoint oracle would disagree).

    Each round persists ONE frame (``upd``, old and new label side by
    side); the full label set, the changed frontier, and the convergence
    counter are all cheap reads of it, so a round costs one delta join +
    one aggregate + one count.  BOTH next-round inputs (labels and
    frontier) reference the current ``upd``, so the LOGICAL plan doubles
    per round even though the data is cached — a ~20-round chain OOMs
    the ANALYZER long before any data pressure (caught by the
    chain-graph tests).  Lineage is therefore truncated with an eager
    ``localCheckpoint`` every ``_CC_CHECKPOINT_EVERY`` rounds: between
    truncations the plan tops out at ~2^8 modest nodes (fine), and the
    shallow components real dedup produces (2-4 rounds) never pay the
    checkpoint at all.  On a real cluster prefer reliable checkpointing
    (executor loss forfeits localCheckpoint lineage).
    """
    own_und = und is None
    if own_und:
        und = (
            pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
            .unionAll(
                pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    # Propagate only over edge-connected nodes (the dedup subgraph is a
    # tiny fraction of the corpus) — every round is proportional to the
    # near-dup population, never the corpus.  The initial label set is
    # materialized once: round 1 reads it from BOTH plan arms (neighbor
    # push + left join), and an unmaterialized distinct would re-shuffle
    # for each arm.
    if nodes is None:
        nodes = (
            und.select(F.col("a").alias("doc_id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    labels = nodes.select("doc_id", F.col("doc_id").alias("lbl"))
    changed = labels  # round 1: every node's self-label is "new"
    prev_persisted: list[DataFrame] = []
    converged = False
    for rnd in range(max_rounds):
        nbr = (
            und.join(changed, und.a == changed.doc_id)
            .groupBy("b")
            .agg(F.min("lbl").alias("nl"))
        )
        upd = labels.join(nbr, labels.doc_id == nbr.b, "left").select(
            labels["doc_id"],
            F.col("lbl"),
            F.least(F.col("lbl"), F.coalesce(F.col("nl"), F.col("lbl"))).alias(
                "new_lbl"
            ),
        )
        if (rnd + 1) % _CC_CHECKPOINT_EVERY == 0:
            upd = upd.localCheckpoint(eager=True)  # truncate lineage
            newly_persisted = []
        else:
            upd = upd.persist(StorageLevel.MEMORY_AND_DISK)
            newly_persisted = [upd]
        n_changed = upd.filter(F.col("new_lbl") < F.col("lbl")).count()
        for df in prev_persisted:
            df.unpersist()
        prev_persisted = newly_persisted
        labels = upd.select("doc_id", F.col("new_lbl").alias("lbl"))
        changed = upd.filter(F.col("new_lbl") < F.col("lbl")).select(
            "doc_id", F.col("new_lbl").alias("lbl")
        )
        if n_changed == 0:
            converged = True
            break
    if own_und:
        und.unpersist()
    if not converged:
        for df in prev_persisted:
            df.unpersist()
        raise RuntimeError(
            f"connected_components: label propagation not converged after "
            f"{max_rounds} rounds (changed labels remain) — "
            f"component diameter exceeds the bound; raise max_rounds"
        )
    # Pin the converged (component-sized) label set eagerly, then release
    # the loop's remaining cache entry so repeated calls leave nothing in
    # the CacheManager.
    final_labels = labels.localCheckpoint(eager=True)
    for df in prev_persisted:
        df.unpersist()
    return final_labels


def cc_incremental(labels: DataFrame, new_pairs: DataFrame, **cc_kwargs) -> DataFrame:
    """Incrementally maintain connected components: merge a batch of NEW
    edges into an existing labeling without re-propagating the old edge
    set — the graph-closure member of the maintenance family
    (``dedup_incremental_pairs``, ``similarity.append_to_ivf_index``,
    ``search.append_to_search_index``).

    Correctness rests on component contraction: in the current labeling
    every component is connected THROUGH its label (lbl = the component's
    min node id, itself a member), so replacing the old edges with the
    STAR edges (node → lbl) preserves exactly the old connectivity.  CC
    over ``stars ∪ new_pairs`` therefore equals CC over
    ``old_edges ∪ new_pairs`` — and since each old component's minimum
    IS its label and labels are nodes of the reduced graph, the merged
    min-labels come out identical to a full rebuild (golden-tested
    against one, including random graphs).

    Cost: the reduced graph has |labeled nodes| + |new batch| edges
    instead of |all old edges| + |new batch|, and star components have
    diameter ≤ 2, so the delta propagation converges in ~2-3 rounds no
    matter how deep the ORIGINAL components were to build — at 100 TB
    the daily closure update touches the label table and the day's new
    near-dup pairs, never the historical pair corpus.

    Small-graph fast path: each distributed propagation round costs a
    join + aggregate + count — a fixed multi-job floor that dominates
    when the reduced graph is change-sized (hundreds of edges for a
    steady-state batch).  So, like AQE deciding a broadcast join from
    the RUNTIME size, one bounded ``limit(N+1)`` probe checks whether
    the reduced edge set fits ``CC_DRIVER_EDGE_LIMIT``; if it does, the
    closure is a driver union-find over the collected edges (min-label
    semantics identical by construction — golden-diffed against the
    distributed path, including on random graphs), and the whole stage
    is one bounded job instead of ~3 rounds × 3 jobs each.  Past the
    limit — a migration batch, a massive cluster merge — the probe is
    abandoned and the distributed delta propagation runs unchanged.
    The collect is capped at N edge rows (a few MB), the same
    control-plane bound as the build's histogram collects.
    """
    stars = labels.filter(F.col("doc_id") != F.col("lbl")).select(
        F.col("doc_id").alias("doc_a"), F.col("lbl").alias("doc_b")
    )
    reduced = stars.unionByName(new_pairs.select("doc_a", "doc_b"))
    if not cc_kwargs and CC_DRIVER_EDGE_LIMIT > 0:
        probe = reduced.limit(CC_DRIVER_EDGE_LIMIT + 1).collect()
        if len(probe) <= CC_DRIVER_EDGE_LIMIT:
            parent: dict = {}

            def find(x):
                r = x
                while parent[r] != r:
                    r = parent[r]
                while parent[x] != r:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for row in probe:
                a, b = row[0], row[1]
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
            comp_min: dict = {}
            for n in parent:
                r = find(n)
                if r not in comp_min or n < comp_min[r]:
                    comp_min[r] = n
            out_rows = [(n, comp_min[find(n)]) for n in parent]
            spark = reduced.sparkSession
            id_type = reduced.schema["doc_a"].dataType
            schema = T.StructType(
                [
                    T.StructField("doc_id", id_type, True),
                    T.StructField("lbl", id_type, True),
                ]
            )
            return local_df(spark, out_rows, schema)
    return connected_components(reduced, **cc_kwargs)


@_register(
    "dedup_clusters",
    f"""WITH RECURSIVE {_minhash_ctes()},
      und AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b AS a, doc_a AS b FROM pairs
      ),
      reach(id, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT u.b, r.lbl FROM reach r JOIN und u ON u.a = r.id
      )
      SELECT id AS doc_id,
             MIN(lbl) AS cluster_id,
             MIN(lbl) = id AS is_canonical
      FROM reach GROUP BY id ORDER BY doc_id""",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster closure: connected components over the MinHash
    pairs, keeping the lowest doc_id per component as canonical — the
    step that turns a pair list into an actual keep/drop decision.

    Spark side is iterative min-label propagation with DELTA propagation
    (the standard distributed CC optimization): round 1 pushes every
    node's label to its neighbors; every later round joins the edge list
    against ONLY the labels that changed last round.  A node whose label
    did not change in round k already pushed that label in the round
    after it last changed, so its neighbors hold it — skipping it loses
    nothing, and the per-round join shrinks with the frontier (most of
    the graph settles in 1-2 rounds; only the deepest components keep
    paying).  Converges in O(component diameter) rounds; the loop stops
    when a round changes no label.  At 100 TB this is large-scale CC
    exactly as run in production dedup pipelines (no driver-side
    union-find — the driver only sees the changed-label counter).
    The DuckDB oracle reaches the same fixpoint via a recursive CTE — an
    entirely independent evaluation strategy.
    """
    # localCheckpoint truncates the (large) LSH lineage so each CC round
    # plans against a leaf scan instead of re-analyzing the whole minhash
    # DAG — measured ~2 s/round of pure planning without it, ~0.1 s with.
    # (On a real cluster prefer reliable checkpointing: executor loss
    # under localCheckpoint forfeits the truncated lineage.)
    # Session-memoized: the pair list is the LSH family's terminal output
    # (a few hundred rows per 500 docs), deterministic per (session, sf),
    # and by far the most expensive input to this operator — rebuilding
    # the bands-join + Jaccard-verify pipeline per call cost ~1.8 s warm
    # at sf0.1 vs ~0 for reusing the checkpoint.
    def _build_pairs() -> DataFrame:
        p = (
            dedup_minhash_lsh(spark, sf_dir)
            .select("doc_a", "doc_b")
            .localCheckpoint()
        )
        # Size the loop's partitioning to the SUBGRAPH, not the corpus:
        # the checkpoint inherits corpus-scale partitioning, so every CC
        # round would schedule corpus-scale task counts for edge-scale
        # data.  The count is free (reads the checkpoint).
        n_edges = p.count()
        parts = max(1, min(n_edges // 500_000 + 1, 200))
        if parts < p.rdd.getNumPartitions():
            p = p.repartition(parts)
        return p

    pairs = _session_persisted(spark, sf_dir, "minhash_pairs", _build_pairs)
    und = _session_persisted(
        spark,
        sf_dir,
        "cc_und",
        lambda: pairs.select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
        ).unionAll(
            pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
        ),
    )
    nodes = _session_persisted(
        spark,
        sf_dir,
        "cc_nodes",
        lambda: und.select(F.col("a").alias("doc_id")).distinct(),
    )
    # The CC fixpoint is deterministic per (session, sf) exactly like the
    # pair list feeding it — memoize the LABELS too: the composed ops
    # (curate, the corpus build, the datasheet, the leakage-free split)
    # each consume cluster labels, and without this memo every one of
    # them re-ran the whole label-propagation loop per call.
    final_labels = _session_persisted(
        spark,
        sf_dir,
        "cc_labels",
        lambda: connected_components(pairs, und=und, nodes=nodes),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return (
        docs.join(final_labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("lbl"), F.col("doc_id")).alias("cluster_id"),
            (F.coalesce(F.col("lbl"), F.col("doc_id")) == F.col("doc_id")).alias(
                "is_canonical"
            ),
        )
        .orderBy("doc_id")
    )


@_register_standalone(
    "dedup_canonical_quality",
    f"""WITH RECURSIVE {_minhash_ctes()},
      und AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b AS a, doc_a AS b FROM pairs
      ),
      reach(id, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT u.b, r.lbl FROM reach r JOIN und u ON u.a = r.id
      ),
      labels AS (SELECT id AS doc_id, MIN(lbl) AS cluster_id
                 FROM reach GROUP BY id),
      q AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
            FROM documents)
      SELECT l.doc_id, l.cluster_id,
             CAST(q.n_tokens AS BIGINT) AS n_tokens,
             ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                                ORDER BY q.n_tokens DESC, l.doc_id) = 1
               AS keep
      FROM labels l JOIN q USING (doc_id)
      ORDER BY l.doc_id""",
)
def dedup_canonical_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: within every near-dup cluster
    keep the HIGHEST-QUALITY member, not the lowest id.

    Production dedup pipelines keep the best version of a duplicated
    document (the fullest crawl, the least-truncated copy); min-id keep
    (``dedup_clusters``) answers "which cluster", this operator answers
    "which copy survives".  Quality here is the integer token count
    (longest copy wins, ties to the lower id) — swap in any integer
    quality signal (`curate` scores, `text_lm_surprisal` bits) without
    touching the shape.

    Scale: rides the same CC labels as ``dedup_clusters`` (delta
    propagation, session-memoized pair list); the keep decision is one
    per-cluster window over cluster-sized groups (tiny — a cluster is a
    near-dup clique), never a global sort.
    """
    labels = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    return (
        labels.join(toks, "doc_id")
        .withColumn("keep", F.row_number().over(w) == 1)
        .select("doc_id", "cluster_id", "n_tokens", "keep")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def _simhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per doc from shingle bit votes (pure Catalyst).

    Votes come from 3-gram *shingles*, not unigram tokens: documents drawn
    from a small shared vocabulary have nearly identical token SETS (the
    fixture's random pairs collapse to Hamming 0 on token-level SimHash),
    while shingle sets stay discriminative — planted near-dups land at
    Hamming ≤7 with random pairs ≥15.

    Physical shape — measured sweet spot between intermediate size and
    expression width (all at sf0.1, noop sink, steady-state):

    - explode 60 bit-rows/shingle + 2 groupBys: 15M-row intermediate, 2.4 s
    - single groupBy with 60 bit-sum aggs: tiny intermediate but a huge
      generated aggregate (~10 s one-time codegen compile), 2.4 s steady
    - THIS: explode 4 chunk-rows/shingle, groupBy(doc_id, chunk) with 15
      unconditional bit-sums ``SUM((h >> i) & 1)``, reassemble each 15-bit
      chunk via ``vote_i = 2·cnt_i − n > 0``, then sum the 4 chunk parts
      per doc: 1M-row intermediate, narrow fast-compiling expressions,
      1.7 s steady.  Both shuffles are map-side combined.
    """
    tok = _docs_shingled(spark, sf_dir).withColumn(
        "h", F.conv(F.substring(F.md5(F.col("s")), 1, 15), 16, 10).cast("bigint")
    )
    ck = tok.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_CHUNKS - 1))).alias("c"),
        F.col("h"),
    )
    per_chunk = ck.groupBy("doc_id", "c").agg(
        F.count("*").alias("n"),
        *[
            F.sum(
                F.expr(f"int(shiftrightunsigned(h, c*{SIMHASH_CHUNK_BITS}+{j}) & 1)")
            ).alias(f"c{j}")
            for j in range(SIMHASH_CHUNK_BITS)
        ],
    )
    zero = F.lit(0).cast("bigint")
    part = zero
    for j in range(SIMHASH_CHUNK_BITS):
        part = part + F.when(
            2 * F.col(f"c{j}") > F.col("n"),
            F.expr(f"shiftleft(cast(1 as bigint), c*{SIMHASH_CHUNK_BITS}+{j})"),
        ).otherwise(zero)
    return (
        per_chunk.select("doc_id", part.alias("p"))
        .groupBy("doc_id")
        .agg(F.sum("p").alias("simhash"))
    )


_SIMHASH_SIG_SQL = f"""
  WITH tok AS (
    SELECT doc_id, unnest({_SHINGLES_SQL}) AS t
    FROM documents
  ),
  th AS (
    SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h FROM tok
  ),
  votes AS (
    SELECT doc_id, i,
           SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS score
    FROM th, (SELECT unnest(range(0, {SIMHASH_BITS})) AS i)
    GROUP BY doc_id, i
  ),
  sig AS (
    -- terminal CAST AS BIGINT: DuckDB's SUM over shifted BIGINTs yields
    -- HUGEINT, which pandas converts to float64 — 60-bit signatures exceed
    -- float64's 53-bit exact-integer range and the driver hash goes red
    -- even though the values are identical.
    SELECT doc_id,
           CAST(SUM(CASE WHEN score > 0 THEN (CAST(1 AS BIGINT) << i)
                    ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
  )
"""


@_register_standalone(
    "dedup_simhash_sig",
    _SIMHASH_SIG_SQL + " SELECT doc_id, simhash FROM sig ORDER BY doc_id",
)
def dedup_simhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (the signature table itself).

    Standalone (locally oracled) cert: the driver-graded
    ``dedup_simhash_pairs`` recomputes these signatures inside its plan,
    so a hash-green pairs row certifies the signature path transitively —
    the slot freed here grades an operator the pairs row can't reach.
    """
    return _simhash_sig(spark, sf_dir).orderBy("doc_id")


@_register(
    "dedup_simhash_pairs",
    _SIMHASH_SIG_SQL
    + f""",
      chunks AS (
        SELECT doc_id, simhash, c,
               (simhash >> (c * {SIMHASH_CHUNK_BITS})) & {(1 << SIMHASH_CHUNK_BITS) - 1}
                 AS chunk
        FROM sig, (SELECT unnest(range(0, {SIMHASH_CHUNKS})) AS c)
      ),
      cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
               x.simhash AS ha, y.simhash AS hb
        FROM chunks x JOIN chunks y
          ON x.c = y.c AND x.chunk = y.chunk AND x.doc_id < y.doc_id
      )
      SELECT doc_a, doc_b,
             CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
      FROM cand
      WHERE bit_count(xor(ha, hb)) <= {HAMMING_MAX}
      ORDER BY doc_a, doc_b""",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: chunk-banding + Hamming threshold.

    Classic Google-style near-dup join: 4 × 15-bit chunks; any pair within
    Hamming ≤ 6 over 60 bits must share ≥1 exact chunk (pigeonhole needs
    ≤3 flips/4 chunks — with ≤6 flips, some chunk is clean), so the
    bucket join loses nothing while staying linear in bucket sizes.

    The signature table is persisted: both sides of the chunk self-join
    consume it, and it is two orders of magnitude smaller than the vote
    pipeline that builds it.
    """
    sig = _session_persisted(
        spark, sf_dir, "simhash_sig", lambda: _simhash_sig(spark, sf_dir)
    )
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_CHUNKS - 1))).alias("c"),
    ).withColumn(
        "chunk",
        F.expr(f"shiftrightunsigned(simhash, c * {SIMHASH_CHUNK_BITS})").bitwiseAND(
            (1 << SIMHASH_CHUNK_BITS) - 1
        ),
    )
    x, y = chunks.alias("x"), chunks.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.c") == F.col("y.c"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", hamming.cast("bigint"))
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# n-gram Jaccard via inverted index with df-pruning
# --------------------------------------------------------------------------

@_register(
    "dedup_ngram_jaccard",
    f"""WITH sh AS (
          SELECT doc_id, unnest({_SHINGLES_SQL}) AS s FROM documents
        ),
        rare AS (
          SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= {NGRAM_MAX_DF}
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM sh a JOIN rare r ON a.s = r.s
          JOIN sh b ON b.s = a.s AND a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.doc_a, c.doc_b, COUNT(*) AS i
          FROM cand c
          JOIN sh a ON a.doc_id = c.doc_a
          JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
          GROUP BY c.doc_a, c.doc_b
        )
        SELECT i.doc_a, i.doc_b,
               round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 4) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.5
        ORDER BY i.doc_a, i.doc_b""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs via inverted-index join + df-pruning.

    Candidate generation joins docs only through *rare* shingles
    (document frequency ≤ {NGRAM_MAX_DF}), the standard guard that keeps an
    inverted-index self-join from going quadratic on stopword-ish shingles.
    Near-dups always share rare shingles, so recall at high thresholds is
    unaffected.

    The inverted index is one groupBy over the exploded shingles:
    ``s → collect_list(doc_id)``, df-pruned by posting-list size.
    Candidate pairs expand *inside* each rare posting list (≤ MAX_DF docs
    → ≤ MAX_DF² tiny pairs, generated map-side) instead of the classic
    two-sided self-join on the shingle string — removes two hash joins
    and a wide string shuffle from the plan.  The per-doc verify arrays
    come from the session-memoized minhash per-doc table (same distinct
    shingle sets — the minhash columns ride along unused), so a sweep
    that has already run any LSH-family query pays zero extra shingle
    groupBys here; the inverted index keeps its own memoized explode.
    """
    sh = _session_persisted(
        spark, sf_dir, "ngram_shingles", lambda: _docs_shingled(spark, sf_dir)
    )
    per_doc = _minhash_per_doc(spark, sf_dir).select("doc_id", "ss", "n")
    postings = (
        sh.groupBy("s")
        .agg(F.collect_list("doc_id").alias("docs"))
        .filter(F.size("docs") <= NGRAM_MAX_DF)
    )
    cand = (
        postings.select(F.explode("docs").alias("doc_a"), "docs")
        .select("doc_a", F.explode("docs").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )
    return _verify_jaccard(per_doc, cand, 0.5)


# --------------------------------------------------------------------------
# embedding cosine near-dup (brute top-k pairs; LSH path in similarity.py)
# --------------------------------------------------------------------------

COSINE_TOPK_PAIRS = 20
EMB_BLOCKS = 16  # block-pair tasks = 16·17/2 = 136; each block ~n/16 vectors


def cosine_expr(a: Column, b: Column) -> Column:
    """Native cosine similarity over two array<double> columns."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    return dot / (norm(a) * norm(b))


@_register(
    "dedup_embedding_topk_pairs",
    f"""SELECT doc_a, doc_b, cosine FROM (
          SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                 round(list_cosine_similarity(
                   list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                   list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS cosine,
                 ROW_NUMBER() OVER (
                   ORDER BY round(list_cosine_similarity(
                     list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                     list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) DESC,
                   a.vec_id, b.vec_id) AS rn
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) t
        WHERE rn <= {COSINE_TOPK_PAIRS}
        ORDER BY cosine DESC, doc_a, doc_b""",
)
def dedup_embedding_topk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most-similar embedding pairs — blocked-GEMM exact all-pairs.

    The scalable shape for exact all-pairs cosine: hash vectors into
    ``EMB_BLOCKS`` blocks, self-join the (tiny) block table on
    ``x.b <= y.b`` so every unordered block pair is one task, and compute
    each block×block similarity tile as a single numpy matmul inside an
    Arrow-batched ``mapInPandas`` stage.  Per-task cost is O((n/B)²·d)
    with bounded memory regardless of corpus size — at 100 TB you grow B,
    not the task.  Each tile keeps only its local top-k (pruned in the
    SAME total order as the global sort, so pruning is lossless) and a
    final TakeOrderedAndProject merges the ≤ B²/2·k candidates.

    Measured at sf0.1 (5k vectors × 64 dims): 5.5 s as a pure-Catalyst
    columnar-unrolled join (`_embedding_topk_pairs_catalyst`), ~1 s as
    blocked GEMM — per-pair arithmetic is exactly where vectorized numpy
    beats row-expression codegen.
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    blocks = (
        emb.withColumn("b", F.pmod(F.xxhash64("vec_id"), F.lit(EMB_BLOCKS)))
        .groupBy("b")
        .agg(F.collect_list(F.struct("vec_id", "e")).alias("rows"))
    )
    x, y = blocks.alias("x"), blocks.alias("y")
    tiles = x.join(y, F.col("x.b") <= F.col("y.b")).select(
        F.col("x.b").alias("xb"),
        F.col("x.rows").alias("xrows"),
        F.col("y.b").alias("yb"),
        F.col("y.rows").alias("yrows"),
    )
    k = COSINE_TOPK_PAIRS

    def tile_topk(batches):
        for pdf in batches:
            out = []
            for xb, xrows, yb, yrows in zip(
                pdf["xb"], pdf["xrows"], pdf["yb"], pdf["yrows"]
            ):
                ida = np.asarray([r["vec_id"] for r in xrows], dtype=np.int64)
                idb = np.asarray([r["vec_id"] for r in yrows], dtype=np.int64)
                A = np.asarray([r["e"] for r in xrows], dtype=np.float64)
                B = np.asarray([r["e"] for r in yrows], dtype=np.float64)
                A /= np.linalg.norm(A, axis=1, keepdims=True)
                B /= np.linalg.norm(B, axis=1, keepdims=True)
                S = A @ B.T
                # same-block tile: strict upper triangle; cross-block tile:
                # every (i,j) pair appears in exactly one tile, oriented as
                # (min_id, max_id) so no pair is lost to block assignment.
                mask = (
                    ida[:, None] < idb[None, :]
                    if xb == yb
                    else ida[:, None] != idb[None, :]
                )
                ii, jj = np.nonzero(mask)
                da = np.minimum(ida[ii], idb[jj])
                db = np.maximum(ida[ii], idb[jj])
                s = S[ii, jj]
                # HALF_UP at 6 dp — matches Spark round() and DuckDB round()
                # (np.round would be banker's); ranking uses ROUNDED values
                # so local pruning agrees with the oracle's ORDER BY.
                cos = np.sign(s) * np.floor(np.abs(s) * 1e6 + 0.5) / 1e6
                top = np.lexsort((db, da, -cos))[:k]
                out.append(
                    pd.DataFrame(
                        {"doc_a": da[top], "doc_b": db[top], "cosine": cos[top]}
                    )
                )
            yield (
                pd.concat(out)
                if out
                else pd.DataFrame({"doc_a": [], "doc_b": [], "cosine": []})
            )

    cand = tiles.mapInPandas(
        tile_topk, "doc_a bigint, doc_b bigint, cosine double"
    )
    # orderBy+limit plans as TakeOrderedAndProject (per-partition heaps,
    # no global sort) — strictly better than a ROW_NUMBER window here.
    return cand.orderBy(F.desc("cosine"), "doc_a", "doc_b").limit(k)


def _embedding_topk_pairs_catalyst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-Catalyst exact all-pairs (the GEMM operator's differential twin).

    Kept unregistered as an independent implementation for the equivalence
    test: 1) pre-normalize ONCE so pairs need only a dot; 2) explode the
    array into 64 scalar DOUBLE columns before the join — higher-order
    array fns are interpreted per element, while plain column arithmetic
    stays inside whole-stage codegen (6× over the zip_with fold).
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    dim = 64  # embeddings fixture dimension; see FIXTURES.md
    norm = F.sqrt(
        sum(
            (F.col("e")[i] * F.col("e")[i] for i in range(1, dim)),
            start=F.col("e")[0] * F.col("e")[0],
        )
    )
    cols = emb.select(
        "vec_id", *[(F.col("e")[i] / norm).alias(f"e{i}") for i in range(dim)]
    )
    a, b = cols.alias("a"), cols.alias("b")
    dot = sum(
        (F.col(f"a.e{i}") * F.col(f"b.e{i}") for i in range(1, dim)),
        start=F.col("a.e0") * F.col("b.e0"),
    )
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("doc_a"),
        F.col("b.vec_id").alias("doc_b"),
        F.round(dot, 6).alias("cosine"),
    )
    return pairs.orderBy(F.desc("cosine"), "doc_a", "doc_b").limit(
        COSINE_TOPK_PAIRS
    )


# --------------------------------------------------------------------------
# Winnowing fingerprints (rolling-hash document fingerprinting)
# --------------------------------------------------------------------------
# The MOSS/winnowing scheme (Schleimer, Wilkerson, Aiken, SIGMOD'03): hash
# every k-gram in SEQUENCE (the rolling-hash pass), then keep the minimum
# hash of each w-window of consecutive k-gram hashes.  Guarantee: any
# shared token run of length ≥ w+k-1 between two documents yields at least
# one shared fingerprint — the partial-overlap detector the whole-document
# similarity family (minhash/simhash/Jaccard) cannot provide, because
# those compare SETS and dilute a short shared run inside big documents.

WINNOW_K = 3   # k-gram width (tokens) — matches the shingle width
WINNOW_W = 4   # winnowing window (k-gram hashes per window)
# Pairs sharing ≥ this many fingerprints.  MUST stay 1 for the winnowing
# guarantee to hold end-to-end: a shared run of exactly w+k-1 tokens is
# only promised ONE shared fingerprint — a higher threshold would silently
# drop minimum-length detectable overlaps.  Raise only as an explicit
# precision knob with that trade-off in mind.
WINNOW_MIN_SHARED = 1
WINNOW_MAX_DF = 20      # df-prune: drop fingerprints in > this many docs


def _winnow_hash_seq() -> F.Column:
    """ORDERED k-gram hash sequence per document (column over `t`).

    Unlike `_docs_shingled` this keeps duplicates and order — winnowing is
    positional.  The md5→15-hex-digit bigint is the same k-gram hash the
    rest of the dedup family uses; "rolling" refers to the O(1) update
    mechanics of the scan, not the hash semantics, so the certified
    artifact (per-window minima) is implementation-independent.
    """
    gram = "concat_ws(' ', " + ", ".join(
        f"t[i+{j}]" for j in range(WINNOW_K)
    ) + ")"
    return F.expr(
        f"transform(sequence(0, size(t)-{WINNOW_K}),"
        f" i -> cast(conv(substring(md5({gram}), 1, 15), 16, 10) as bigint))"
    )


_WINNOW_SQL = f"""
  WITH toks AS (
    SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
  ),
  hseq AS (
    SELECT doc_id,
           CASE WHEN len(t) >= {WINNOW_K}
                THEN list_transform(
                       range(1, len(t) - {WINNOW_K - 2}),
                       i -> CAST(('0x' || substr(md5(
                              array_to_string(t[i:i+{WINNOW_K - 1}], ' ')),
                              1, 15)) AS BIGINT))
                ELSE [CAST(('0x' || substr(md5(array_to_string(t, ' ')),
                       1, 15)) AS BIGINT)]
           END AS h
    FROM toks
  ),
  wins AS (
    SELECT doc_id,
           CASE WHEN len(h) >= {WINNOW_W}
                THEN list_distinct(list_transform(
                       range(1, len(h) - {WINNOW_W - 2}),
                       j -> list_min(h[j:j+{WINNOW_W - 1}])))
                ELSE [list_min(h)]
           END AS fps
    FROM hseq
  )
"""


@_register_standalone(
    "dedup_winnow_fp",
    _WINNOW_SQL
    + """SELECT doc_id, unnest(fps) AS fp FROM wins ORDER BY doc_id, fp""",
)
def dedup_winnow_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint table: (doc_id, fp) — the per-window minima
    of the ordered k-gram hash sequence, distinct per document.

    Scale shape: pure per-document projection (tokenize → hash sequence →
    window minima → distinct) with one explode — no shuffle at all; the
    fingerprint table is ~|doc|/w rows per document and is what gets
    stored/indexed at 100 TB.  Locally oracled (standalone gate); the
    pair query below is the graded-pipeline consumer.
    """
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.split(F.lower(F.col("text")), " ").alias("t"),
    )
    fallback_hash = F.expr(
        "cast(conv(substring(md5(concat_ws(' ', t)), 1, 15), 16, 10) as bigint)"
    )
    hseq = toks.select(
        "doc_id",
        F.when(F.size("t") >= WINNOW_K, _winnow_hash_seq())
        .otherwise(F.array(fallback_hash))
        .alias("h"),
    )
    wins = hseq.select(
        "doc_id",
        F.when(
            F.size("h") >= WINNOW_W,
            F.array_distinct(
                F.expr(
                    f"transform(sequence(0, size(h)-{WINNOW_W}),"
                    f" j -> array_min(slice(h, j+1, {WINNOW_W})))"
                )
            ),
        )
        .otherwise(F.array(F.array_min("h")))
        .alias("fps"),
    )
    return wins.select("doc_id", F.explode("fps").alias("fp")).orderBy(
        "doc_id", "fp"
    )


@_register_standalone(
    "dedup_winnow_pairs",
    _WINNOW_SQL
    + f""",
      fp AS (SELECT doc_id, unnest(fps) AS fp FROM wins),
      rare AS (
        SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) <= {WINNOW_MAX_DF}
      ),
      shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_fps
        FROM fp a JOIN rare r ON a.fp = r.fp
        JOIN fp b ON b.fp = a.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
      )
      SELECT doc_a, doc_b, CAST(shared_fps AS BIGINT) AS shared_fps
      FROM shared WHERE shared_fps >= {WINNOW_MIN_SHARED}
      ORDER BY doc_a, doc_b""",
)
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-overlap candidate pairs: documents sharing ≥
    WINNOW_MIN_SHARED winnowing fingerprints — catches copied PASSAGES,
    not just near-identical whole documents.

    Scale shape: the same df-pruned inverted-index join as
    ``dedup_ngram_jaccard`` (posting lists of rare fingerprints expand to
    pairs; quadratic only within a fingerprint's ≤WINNOW_MAX_DF posting
    list), but over the ~w×-smaller winnowed table instead of all
    shingles — the standard plagiarism/contamination index layout.
    """
    fp = _session_persisted(
        spark, sf_dir, "winnow_fp", lambda: dedup_winnow_fp(spark, sf_dir)
    )
    rare = fp.groupBy("fp").count().filter(F.col("count") <= WINNOW_MAX_DF)
    posting = fp.join(rare.select("fp"), "fp")
    a = posting.alias("a")
    b = posting.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("bigint").alias("shared_fps"))
        .filter(F.col("shared_fps") >= WINNOW_MIN_SHARED)
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# Incremental corpus dedup: new batch vs a persisted LSH index
# --------------------------------------------------------------------------

#: fixture batch split: every 10th doc arrives "today", the rest ARE the corpus
_NEW_BATCH_PRED_SQL = "doc_id % 10 = 0"


def dedup_incremental_pairs(
    per_doc_new: DataFrame, bands_new: DataFrame, bands_corpus: DataFrame,
    per_doc_corpus: DataFrame, threshold: float = JACCARD_THRESHOLD,
    max_n: int | None = None,
) -> DataFrame:
    """Near-dup pairs TOUCHING the new batch, without ever joining
    corpus×corpus: candidates are (new ⋈ corpus-index bands) ∪ (new
    self-join) — exactly the pairs a full rebuild would emit minus the
    corpus-internal ones, which by definition were already found when
    those docs were themselves new.

    This is the 100 TB shape of dedup maintenance: the band table is the
    PERSISTED index (built once per doc at ingest, `_band_table`), the
    daily cost is |new bands| bucket probes + a new×new self-join, and
    the corpus is never re-shingled.  Losslessness is certified by the
    oracle, which runs the FULL rebuild and filters to touching-new.
    """
    nb, cb = bands_new.alias("x"), bands_corpus.alias("y")
    cand_nc = (
        nb.join(
            cb,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_key") == F.col("y.band_key")),
        )
        .select(
            F.least(F.col("x.doc_id"), F.col("y.doc_id")).alias("doc_a"),
            F.greatest(F.col("x.doc_id"), F.col("y.doc_id")).alias("doc_b"),
        )
    )
    n2a, n2b = bands_new.alias("x"), bands_new.alias("y")
    cand_nn = (
        n2a.join(
            n2b,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
    )
    cand = cand_nc.unionByName(cand_nn).distinct()
    per_doc_all = per_doc_new.unionByName(per_doc_corpus)
    # ``max_n`` lets streaming callers route the verify path from
    # persisted index stats instead of probing max(n) over the whole
    # union each batch — that probe is an O(index) scan that would undo
    # the persisted-band O(batch) claim (and the union handle is fresh
    # per batch, so the session memo never hits).
    return _verify_jaccard(per_doc_all, cand, threshold, max_n=max_n)


def _incremental_oracle_sql() -> str:
    # The INDEPENDENT plan: a full-corpus rebuild filtered to pairs that
    # touch the new batch — if the incremental decomposition dropped or
    # invented a candidate anywhere, this differs.
    return (
        f"WITH {_minhash_ctes()} "
        "SELECT doc_a, doc_b, jaccard FROM pairs "
        f"WHERE (doc_a % 10 = 0) OR (doc_b % 10 = 0) "
        "ORDER BY doc_a, doc_b"
    )


@_register_standalone("dedup_incremental", _incremental_oracle_sql())
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture form: docs with ``doc_id % 10 == 0`` are the arriving
    batch, the rest are the already-indexed corpus.  The per-doc
    signature table is the session memo (modelling the persisted index);
    only its band PROJECTIONS are split new/corpus — the corpus is never
    re-shingled and corpus×corpus pairs are never generated."""
    per_doc = _minhash_per_doc(spark, sf_dir)
    is_new = F.col("doc_id") % 10 == 0
    bands = _band_table(per_doc)
    return dedup_incremental_pairs(
        per_doc.filter(is_new),
        bands.filter(is_new),
        bands.filter(~is_new),
        per_doc.filter(~is_new),
    )


# --------------------------------------------------------------------------
# exact set-similarity join via PREFIX FILTERING (PPJoin-style)
# --------------------------------------------------------------------------

#: Jaccard threshold for the prefix-filtered join — matches the
#: ``dedup_ngram_jaccard`` cert so the two candidate-generation
#: disciplines are directly comparable on the same ground truth.
PREFIX_JACCARD_T = 0.5


def prefix_filtered_candidates(sh: DataFrame, t: float) -> DataFrame:
    """Candidate (doc_a < doc_b) pairs whose Jaccard CAN reach ``t``,
    generated by prefix filtering over a global rare-first token order.

    The published discipline (SSJoin primitive, Chaudhuri/Ganti/Kaushik
    ICDE'06; PPJoin, Xiao/Wang/Lin/Yu WWW'08 — public papers): order
    every document's shingles by ascending global document frequency
    (ties by the shingle string — any consistent total order works) and
    join only on each document's PREFIX, the first
    ``n - ceil(t*n) + 1`` shingles.  Two sets with ``J >= t`` overlap in
    at least ``ceil(t*max(na, nb))`` shingles, and sets that overlap
    that much must share at least one shingle inside both prefixes — so
    recall is EXACTLY 1.0, no contract needed.  This is the structural
    difference from ``NGRAM_MAX_DF`` df-pruning: pruning drops hot
    shingles and documents pairs that share only hot shingles are lost
    (a documented recall contract); the prefix filter keeps every true
    pair and *still* never joins through hot shingles in practice,
    because the rare-first order pushes the hottest shingles to the END
    of each document — out of the prefix.  Candidate cost is
    Σ_{prefix tokens} df_prefix(token)², where the prefix posting lists
    are the globally RAREST tokens — the quantity prefix filtering is
    designed to keep small.

    The length filter rides along for free: ``J >= t`` forces
    ``min(na, nb) >= t * max(na, nb)``, pruning candidates whose sizes
    alone rule them out before the verify join.

    Scale shape: one groupBy(s) for the df table, one df join + one
    doc_id-partitioned window pass (rank + count share the same
    shuffle), then a posting self-join that touches ONLY prefix rows.
    At 100 TB the df table is vocabulary-sized (broadcastable for text
    corpora), the window is a per-doc sort of its shingle set, and the
    posting join is bounded by rare-token df² — the same reason the
    production set-similarity joins (PPJoin family) scale.
    """
    df_tbl = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    w_rank = Window.partitionBy("doc_id").orderBy("df", "s")
    w_all = Window.partitionBy("doc_id")
    pref = (
        sh.join(df_tbl, "s")
        .withColumn("pos", F.row_number().over(w_rank))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
        .filter(F.col("pos") <= F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1)
        .select("doc_id", "s", "n")
    )
    a = pref.select(F.col("doc_id").alias("doc_a"), "s", F.col("n").alias("na"))
    b = pref.select(F.col("doc_id").alias("doc_b"), "s", F.col("n").alias("nb"))
    return (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(F.least("na", "nb") >= F.lit(t) * F.greatest("na", "nb"))
        .select("doc_a", "doc_b")
        .distinct()
    )


#: Ground-truth oracle: the FULL quadratic Jaccard join, no filtering of
#: any kind — certifying the prefix filter's exact-recall claim, not just
#: its arithmetic (the df-pruned cert can only be certified against its
#: own pruned candidate set).
_PREFIX_ORACLE = f"""
WITH sh AS (SELECT doc_id, unnest({_SHINGLES_SQL}) AS s FROM documents),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON b.s = a.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 4) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= {PREFIX_JACCARD_T}
ORDER BY i.doc_a, i.doc_b
"""


@_register_standalone("dedup_jaccard_prefix", _PREFIX_ORACLE)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard pairs at ``PREFIX_JACCARD_T`` via prefix filtering —
    the recall-lossless sibling of ``dedup_ngram_jaccard``.  The oracle
    is the unfiltered quadratic join, so a single dropped candidate
    anywhere in the prefix logic hash-fails the cert."""
    sh = _session_persisted(
        spark, sf_dir, "ngram_shingles", lambda: _docs_shingled(spark, sf_dir)
    )
    per_doc = _minhash_per_doc(spark, sf_dir).select("doc_id", "ss", "n")
    cand = prefix_filtered_candidates(sh, PREFIX_JACCARD_T)
    return _verify_jaccard(per_doc, cand, PREFIX_JACCARD_T)


# --- cross-document exact substring spans -----------------------------------
#
# The exact-substring dedup pass of Lee et al., "Deduplicating Training Data
# Makes Language Models Better" (ACL'22): find every maximal token run that
# appears verbatim in ≥2 documents, so the pipeline can CUT the repeated
# span instead of dropping whole documents.  The published implementation
# builds a monolithic suffix array; the distributed re-expression is n-gram
# fingerprint postings + a gaps-and-islands merge, which needs only uniform
# hash shuffles:
#
#   1. every SPAN_NGRAM-token window → (doc_id, pos, gram-hash)   [map-only]
#   2. gram df over distinct docs; keep grams in ≥2 docs          [1 shuffle]
#   3. join hits back to postings                                 [1 shuffle]
#   4. per-doc islands of consecutive positions → maximal spans   [1 shuffle]
#
# Correctness link to the suffix-array semantics: a substring of length
# L ≥ SPAN_NGRAM shared by two docs makes ALL of its L-SPAN_NGRAM+1 gram
# positions shared, so the island merge reconstructs exactly the maximal
# shared runs (gram-hash collisions aside — 60-bit md5 prefix, the same
# cross-engine hash the rest of the family pins).
#
# Reference behavior anchored: the reference dedups rows only by whole-row
# hash (src/services/csv_validator.py staging_row_hash); passage-level
# dedup is the corpus-scale extension of that contract.

SPAN_NGRAM = 8      # gram width (tokens) — minimum detectable run
SPAN_MIN_TOKENS = 12  # report only spans at least this many tokens long

def _span_ctes_body(src: str = "documents") -> str:
    """The span-detection CTE chain (toks → g → shared → hits → isl →
    spans) parameterized by its source relation, WITHOUT the leading
    WITH — so the composed corpus-build oracle can run the identical
    span logic over a survivors CTE instead of the base table."""
    return f"""toks AS (
    SELECT doc_id, string_split(lower(text), ' ') AS t FROM {src}
  ),
  g AS (
    SELECT doc_id,
           unnest(range(1, len(t) - {SPAN_NGRAM - 2})) AS pos1,
           unnest(list_transform(
             range(1, len(t) - {SPAN_NGRAM - 2}),
             i -> CAST(('0x' || substr(md5(
                    array_to_string(t[i:i+{SPAN_NGRAM - 1}], ' ')),
                    1, 15)) AS BIGINT))) AS g
    FROM toks WHERE len(t) >= {SPAN_NGRAM}
  ),
  shared AS (
    SELECT g FROM g GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
  ),
  hits AS (SELECT doc_id, pos1 FROM g JOIN shared USING (g)),
  isl AS (
    SELECT doc_id, pos1,
           pos1 - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos1)
             AS grp
    FROM hits
  ),
  spans AS (
    SELECT doc_id, MIN(pos1) - 1 AS span_start,
           MAX(pos1) - MIN(pos1) + {SPAN_NGRAM} AS span_len
    FROM isl GROUP BY doc_id, grp
  )
"""


_SPAN_CTES = "\n  WITH " + _span_ctes_body("documents")

_SPAN_ORACLE = (
    _SPAN_CTES
    + f"""
  SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
         CAST(span_len AS BIGINT) AS span_len
  FROM spans WHERE span_len >= {SPAN_MIN_TOKENS}
  ORDER BY doc_id, span_start
"""
)


def span_gram_table(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, g): every SPAN_NGRAM-token window of each doc with
    its 60-bit md5 gram hash — the positional gram projection the span
    family shares.  The incremental corpus build persists the distinct
    (g, doc_id) postings of this table as its span-state index."""
    toks = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("t")
    ).filter(F.size("t") >= SPAN_NGRAM)
    gram = "concat_ws(' ', slice(t, i+1, " + str(SPAN_NGRAM) + "))"
    return toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(t)-{SPAN_NGRAM}),"
                f" i -> struct(i as pos, cast(conv(substring(md5({gram}),"
                f" 1, 15), 16, 10) as bigint) as g))"
            )
        ).alias("pg"),
    ).select("doc_id", F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))


def spans_from_hits(hits: DataFrame) -> DataFrame:
    """(doc_id, span_start, span_len) maximal islands from a (doc_id,
    pos) frame of repeated-gram positions — the gaps-and-islands tail of
    the span family, shared by the full and incremental forms."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
    spans = isl.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") - F.min("pos") + F.lit(SPAN_NGRAM)).alias("span_len"),
    )
    return (
        spans.filter(F.col("span_len") >= SPAN_MIN_TOKENS)
        .select(
            "doc_id",
            F.col("span_start").cast("bigint").alias("span_start"),
            F.col("span_len").cast("bigint").alias("span_len"),
        )
        .orderBy("doc_id", "span_start")
    )


def substring_spans_frame(docs: DataFrame) -> DataFrame:
    """Frame form of :func:`dedup_substring_spans` over any (doc_id,
    text) frame — the composed corpus build runs it over the dedup
    SURVIVORS rather than the base table."""
    grams = span_gram_table(docs)
    shared = (
        grams.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("g")
    )
    hits = grams.join(shared, "g").select("doc_id", "pos")
    return spans_from_hits(hits)


@_register_standalone("dedup_substring_spans", _SPAN_ORACLE)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document exact substring spans:
    (doc_id, span_start, span_len) for every maximal run of ≥
    SPAN_MIN_TOKENS tokens that appears verbatim in at least one OTHER
    document.  span_start is a 0-based token offset.

    Scale shape: three uniform hash shuffles (gram df, hit join-back,
    per-doc island window).  The df≥2 filter drops the unique-gram bulk
    — the overwhelming majority of a real corpus — before the join-back,
    and map-side combine compresses the df aggregation, so the heavy
    stage moves O(shared grams), not O(corpus grams).  No suffix array,
    no global sort over the corpus.
    """
    # fan_scan: the gram explode + posting build dominates (measured 0.56x)
    return substring_spans_frame(
        load_table(spark, sf_dir, "documents", fan_scan=True).select(
            "doc_id", "text"
        )
    )


def substring_cut_tokens_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, t_clean) for EVERY doc in ``docs``: the lowercased token
    sequence with every cross-document-repeated span (the
    :func:`substring_spans_frame` output over the same frame) removed,
    original order preserved.  The ordered-token form of
    :func:`dedup_substring_cut` — the composed corpus build feeds it to
    DSIR scoring, so the cleaned TEXT (not just its hash) must exist as
    a column."""
    return cut_tokens_by_spans(docs, substring_spans_frame(docs))


def cut_tokens_by_spans(docs: DataFrame, spans: DataFrame) -> DataFrame:
    """(doc_id, n_total, t_clean): each doc's lowercased tokens with the
    given (doc_id, span_start, span_len) intervals removed — the cut
    tail shared by the full and incremental span-decontamination
    forms."""
    spans_per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_len")).alias("sp")
    )
    toks = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("t")
    )
    kept = F.expr(
        "filter(transform(t, (x, i) -> struct(x AS tok, i AS pos)),"
        " p -> NOT exists(sp, s -> p.pos >= s.span_start"
        " AND p.pos < s.span_start + s.span_len))"
    )
    return (
        toks.join(spans_per_doc, "doc_id", "left")
        .withColumn("sp", F.coalesce("sp", F.array()))
        .select("doc_id", F.size("t").alias("n_total"), kept.alias("kept"))
        .select(
            "doc_id",
            "n_total",
            F.col("kept.tok").alias("t_clean"),
        )
    )


_CUT_ORACLE = (
    _SPAN_CTES
    + f""",
  covered AS (
    SELECT DISTINCT doc_id,
           unnest(range(span_start + 1, span_start + span_len + 1)) AS pos1
    FROM spans WHERE span_len >= {SPAN_MIN_TOKENS}
  ),
  pos AS (
    SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos1, unnest(t) AS tok
    FROM toks
  ),
  kept AS (
    SELECT p.doc_id, p.pos1, p.tok
    FROM pos p LEFT JOIN covered c
      ON c.doc_id = p.doc_id AND c.pos1 = p.pos1
    WHERE c.pos1 IS NULL
  ),
  agg AS (
    SELECT doc_id, COUNT(*) AS n_kept,
           string_agg(tok, ' ' ORDER BY pos1) AS clean
    FROM kept GROUP BY doc_id
  )
  SELECT t.doc_id,
         CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
         CAST(len(t.t) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
         md5(coalesce(a.clean, '')) AS clean_hash
  FROM toks t LEFT JOIN agg a USING (doc_id)
  ORDER BY t.doc_id
"""
)


@_register_standalone("dedup_substring_cut", _CUT_ORACLE)
def dedup_substring_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level remediation: every cross-document-repeated span (the
    ``dedup_substring_spans`` output) is CUT from every document —
    returns (doc_id, n_kept, n_removed, clean_hash) for the whole
    corpus, untouched docs included.

    This is the "remove the repeated substring, keep the document"
    policy of exact-substring dedup (vs dropping whole near-dup docs) —
    the right remediation when the repetition is boilerplate or
    contamination rather than a duplicated document.  Scale shape: the
    span table aggregates to one per-doc interval array (tiny — a
    handful of spans per affected doc; spans are maximal in GRAM space
    but may overlap in token space when two islands sit closer than the
    n-gram width, and the exists-filter takes their union either way),
    one hash join back to the corpus, and a pure Catalyst positional
    filter — no explode of the corpus, no range join.
    """
    # fan_scan measured neutral (1.01x) on the drift-controlled A/B —
    # the cut tail, not the posting build, dominates here; native split
    cut = substring_cut_tokens_frame(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return cut.select(
        "doc_id",
        F.size("t_clean").cast("bigint").alias("n_kept"),
        (F.col("n_total") - F.size("t_clean")).cast("bigint").alias(
            "n_removed"
        ),
        F.md5(F.concat_ws(" ", F.col("t_clean"))).alias("clean_hash"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Fuzzy benchmark decontamination (MinHash-LSH, cross-corpus)
# --------------------------------------------------------------------------
#
# prep_decontaminate (mlprep.py) catches VERBATIM contamination via exact
# 8-gram overlap; production decontamination also drops train documents
# that are NEAR-duplicates of held-out/benchmark documents — lightly
# edited copies share few long n-grams but keep high shingle Jaccard
# (the fuzzy pass GPT-3 appendix C and the Llama reports describe).
# This is that pass, built from the same certified MinHash machinery as
# dedup_minhash_lsh, restricted to TRAIN × HELD-OUT candidates:
# the two band tables come from disjoint splits, so no self-pair or
# train×train work exists anywhere in the plan.


def decontaminate_fuzzy_frame(
    docs: DataFrame, per_doc: DataFrame | None = None
) -> DataFrame:
    """Train docs near-duplicate (Jaccard ≥ threshold) to any held-out
    doc → (doc_train, doc_heldout, jaccard).

    Split convention is prep_split_assign's deterministic md5 bucket:
    train = bucket < TRAIN_PCT, held-out = the rest (val + test — train
    must be clean against EVERYTHING that will ever be evaluated).

    Scale shape: the held-out side is 2% of the corpus (benchmark-sized);
    no static broadcast hint — at 100 TB that 2% is still 2 TB, AQE
    broadcasts when the runtime size genuinely fits (same rationale as
    prep_decontaminate).  Candidate volume is band-bounded exactly as in
    dedup_minhash_lsh, and verification touches candidates only.  Pass
    ``per_doc`` to reuse the family's session-memoized signature table
    (the registered wrapper does — banding + two verify arms consume it).
    """
    from data_ingestion_backend_spark.operators.mlprep import TRAIN_PCT

    if per_doc is None:
        per_doc = minhash_per_doc_frame(docs)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    bands = _band_table(per_doc).withColumn("bucket", bucket)
    train_b = bands.filter(F.col("bucket") < TRAIN_PCT).drop("bucket")
    held_b = bands.filter(F.col("bucket") >= TRAIN_PCT).drop("bucket")
    cand = (
        train_b.alias("x")
        .join(
            held_b.alias("y"),
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_key") == F.col("y.band_key")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verify_jaccard(per_doc, cand, JACCARD_THRESHOLD).select(
        F.col("doc_a").alias("doc_train"),
        F.col("doc_b").alias("doc_heldout"),
        "jaccard",
    )


def _decon_fuzzy_oracle_sql() -> str:
    from data_ingestion_backend_spark.operators.mlprep import TRAIN_PCT

    split = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8)) AS BIGINT) % 100"
    )
    return f"""WITH {_minhash_base_ctes()},
      split AS (SELECT doc_id, {split} AS bucket FROM documents),
      cand AS (
        SELECT DISTINCT x.doc_id AS doc_train, y.doc_id AS doc_heldout
        FROM bands x
        JOIN split sx ON sx.doc_id = x.doc_id AND sx.bucket < {TRAIN_PCT}
        JOIN bands y ON x.band_idx = y.band_idx AND x.band_key = y.band_key
        JOIN split sy ON sy.doc_id = y.doc_id AND sy.bucket >= {TRAIN_PCT}
      ),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT c.doc_train, c.doc_heldout, COUNT(*) AS i
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_train
        JOIN sh b ON b.doc_id = c.doc_heldout AND b.s = a.s
        GROUP BY c.doc_train, c.doc_heldout
      )
      SELECT i.doc_train, i.doc_heldout,
             round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 4) AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_train
      JOIN sizes sb ON sb.doc_id = i.doc_heldout
      WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= {JACCARD_THRESHOLD}
      ORDER BY doc_train, doc_heldout"""


@_register_standalone("prep_decontaminate_fuzzy", _decon_fuzzy_oracle_sql())
def prep_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (near-duplicate) train-vs-held-out decontamination report."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return decontaminate_fuzzy_frame(docs, per_doc=_minhash_per_doc(spark, sf_dir))
