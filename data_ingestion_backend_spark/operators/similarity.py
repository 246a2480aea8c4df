"""Similarity search over embedding columns (SURVEY §2.10).

- **brute-force top-k** — exact cosine against every vector; the
  verification-grade baseline and the per-bucket ranker for the ANN path.
  Native Catalyst (``zip_with`` + ``aggregate`` fold) — no UDF, runs in
  whole-stage codegen next to the parquet scan.
- **multi-query top-k join** — k nearest corpus vectors for *each* query
  vector in one plan (broadcast the queries, window per query) — the Q18
  per-group-top-k pattern applied to kNN.
- **ANN via random-hyperplane LSH** — 16-bit signatures from seeded
  hyperplanes; candidates = corpus vectors whose signature matches the
  query's in ≥1 of 4 4-bit chunks; exact cosine re-ranks candidates.
  At 100 TB the signature is precomputed once per corpus vector and the
  bucket join replaces the all-pairs product; recall is tested against
  the brute-force baseline rather than oracled (approximate results are
  seed-pinned but not SQL-portable).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel

from data_ingestion_backend_spark.operators.dedup import cosine_expr
from data_ingestion_backend_spark.plans.localtable import local_df
from data_ingestion_backend_spark.operators.queries import (
    STANDALONE_QUERIES,
    _register,
    _register_standalone,
)
from data_ingestion_backend_spark.sources.fixtures import load_table

TOPK = 10
EMB_DIM = 64
N_PLANES = 16
# Band geometry is a recall/cost dial and must be tuned to the corpus's
# similarity profile: for near-orthogonal data (these fixtures: top
# neighbors at cosine ≈0.3-0.5, P(plane agrees) ≈0.6) wide bands almost
# never collide (4-bit chunks → recall ≈0.4), so we run narrow 2-bit
# chunks × 8 (recall ≈0.98 at the cost of larger candidate sets).  A
# clustered production corpus (neighbors at cosine ≥0.8 → p ≥0.8) would
# invert the choice: 4 × 4-bit chunks keeps recall ≥0.95 with far fewer
# candidates.
PLANE_CHUNKS, PLANE_CHUNK_BITS = 8, 2

_rng = random.Random(1337)
# seeded unit hyperplanes, shared by signature computation everywhere
HYPERPLANES: list[list[float]] = []
for _ in range(N_PLANES):
    v = [_rng.gauss(0.0, 1.0) for _ in range(EMB_DIM)]
    n = math.sqrt(sum(x * x for x in v))
    HYPERPLANES.append([x / n for x in v])


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"), "label"
    )


@_register(
    "sim_centroids",
    f"""SELECT label, i - 1 AS pos,
              round(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS centroid,
              CAST(COUNT(*) AS BIGINT) AS n_vectors
       FROM embeddings, (SELECT unnest(range(1, {EMB_DIM + 1})) AS i)
       GROUP BY label, i
       ORDER BY label, pos""",
)
def sim_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (elementwise vector mean).

    The vector-aggregation primitive under IVF training, cluster
    analytics, and class prototypes, in long form (label, dim, value):
    posexplode each vector once, then ONE map-side-combined groupBy on
    (label, pos) — sums flow as scalars, never as arrays, so the shuffle
    carries (labels × dims) rows regardless of corpus size.  Rounded to
    6 dp so double-summation order cannot flip the oracle hash.
    """
    e = _emb(spark, sf_dir).select(
        "label", F.posexplode(F.col("e")).alias("pos", "v")
    )
    return (
        e.groupBy("label", "pos")
        .agg(
            F.round(F.avg("v"), 6).alias("centroid"),
            F.count("*").alias("n_vectors"),
        )
        .select("label", F.col("pos").cast("bigint").alias("pos"), "centroid", "n_vectors")
        .orderBy("label", "pos")
    )


@_register_standalone(
    "sim_topk_bruteforce",
    f"""WITH q AS (
          SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
          FROM embeddings WHERE vec_id = 0
        )
        SELECT e.vec_id,
               round(list_cosine_similarity(
                 list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qe), 6)
                 AS cosine
        FROM embeddings e, q
        WHERE e.vec_id <> 0
        ORDER BY cosine DESC, e.vec_id
        LIMIT {TOPK}""",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for one query vector (vec_id=0).

    Plan shape: broadcast 1-row query × corpus scan → codegen'd fold per
    row → TakeOrderedAndProject.  One pass over the corpus, no shuffle of
    vectors.
    """
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("e").alias("qe"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine_expr(F.col("e"), F.col("qe")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOPK)
    )


@_register(
    "sim_multiquery_topk",
    """WITH q AS (
          SELECT vec_id AS query_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
          FROM embeddings WHERE vec_id < 3
        ),
        scored AS (
          SELECT q.query_id, e.vec_id,
                 round(list_cosine_similarity(
                   list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qe), 6)
                   AS cosine
          FROM embeddings e, q
          WHERE e.vec_id <> q.query_id
        )
        SELECT query_id, vec_id, cosine FROM (
          SELECT query_id, vec_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, vec_id) AS rn
          FROM scored) t
        WHERE rn <= 5
        ORDER BY query_id, cosine DESC, vec_id""",
)
def sim_multiquery_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN join: top-5 corpus neighbors for each of 3 query vectors.

    Queries broadcast against one corpus scan; per-query ranking is a
    window over (query_id) — the Q18 per-group top-k shape.  At scale the
    query side is the small side by construction (batch of probes).
    """
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_expr(F.col("e"), F.col("qe")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "vec_id", "cosine")
        .orderBy("query_id", F.desc("cosine"), "vec_id")
    )


# --------------------------------------------------------------------------
# ANN: random-hyperplane LSH (Spark-side; recall-tested, not oracled)
# --------------------------------------------------------------------------

def with_signature(df: DataFrame, vec_col: str, sig_name: str) -> DataFrame:
    """Add a 16-bit random-hyperplane signature column (Arrow-batched GEMM).

    All 16 plane dots per vector are one ``rows×64 @ 64×16`` numpy matmul
    inside ``mapInPandas`` — measured ~3× over the per-plane Catalyst
    fold, which evaluates 16 interpreted 64-element folds per row.  (The
    columnar-unrolled Catalyst variant is even worse: 16 planes × 64
    terms is a ~2000-node expression that falls out of whole-stage
    codegen, 2.9s → 19.8s.)  The fold survives as
    `with_signature_catalyst`, differentially tested equal.  At 100 TB
    the signature is computed once per corpus vector at index-build time
    and stored with the corpus.
    """
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType

    H = np.asarray(HYPERPLANES, dtype=np.float64)  # 16×64, ships with task
    weights = (1 << np.arange(N_PLANES)).astype(np.int64)
    out_schema = StructType(df.schema.fields + [StructField(sig_name, LongType())])

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            bits = (M @ H.T) >= 0
            pdf[sig_name] = (bits * weights).sum(axis=1).astype("int64")
            yield pdf

    return df.mapInPandas(gen, out_schema)


def with_signature_catalyst(df: DataFrame, vec_col: str, sig_name: str) -> DataFrame:
    """Pure-Catalyst signature twin (per-plane aggregate/zip_with fold) —
    kept as the independent implementation for the differential test."""
    e = F.col(vec_col)
    sig = F.lit(0).cast("bigint")
    for i, plane in enumerate(HYPERPLANES):
        dot = F.aggregate(
            F.zip_with(e, F.array(*[F.lit(x) for x in plane]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(dot >= 0, F.lit(1 << i).cast("bigint")).otherwise(0)
    return df.withColumn(sig_name, sig)


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = TOPK,
) -> DataFrame:
    """Approximate kNN: chunked-signature candidate join + exact re-rank.

    ``corpus``: (vec_id, e array<double>); ``queries``: (query_id, qe).
    Candidates share ≥1 of 4 signature chunks with the query (multi-probe
    banding — Hamming ≤ 3 guaranteed recalled by pigeonhole).  The
    signature is one codegen'd expression; at 100 TB it would be
    precomputed and stored with the corpus partitioned by chunk value.
    """
    mask = (1 << PLANE_CHUNK_BITS) - 1
    chunk_ids = F.explode(
        F.array(*[F.lit(c) for c in range(PLANE_CHUNKS)])
    ).alias("c")

    c_sig = with_signature(corpus, "e", "sig")
    q_sig = with_signature(queries, "qe", "qsig")

    c_chunks = c_sig.select("*", chunk_ids).withColumn(
        "chunk", F.expr(f"shiftrightunsigned(sig, c * {PLANE_CHUNK_BITS})").bitwiseAND(mask)
    )
    q_chunks = q_sig.select("*", chunk_ids).withColumn(
        "chunk", F.expr(f"shiftrightunsigned(qsig, c * {PLANE_CHUNK_BITS})").bitwiseAND(mask)
    )

    cand = (
        c_chunks.join(F.broadcast(q_chunks), ["c", "chunk"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qe", "vec_id", "e")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.withColumn("cosine", F.round(cosine_expr(F.col("e"), F.col("qe")), 6))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cosine")
    )


def ann_topk_fixture(spark: SparkSession, sf_dir: str, k: int = TOPK) -> DataFrame:
    """ANN over the embeddings fixture with vec_id<3 as queries."""
    emb = _emb(spark, sf_dir)
    corpus = emb.select("vec_id", "e")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    return ann_topk(corpus, queries, k)


# --------------------------------------------------------------------------
# ANN: IVF (inverted-file) — coarse quantizer + probed exact re-rank
# --------------------------------------------------------------------------

IVF_CLUSTERS, IVF_NPROBE = 16, 4
IVF_SAMPLE, IVF_ITERS = 1024, 8


def _train_centroids_sample(emb: DataFrame) -> "np.ndarray":  # noqa: F821
    """Sample-fit coarse quantizer: Lloyd's k-means on a bounded,
    DETERMINISTIC sample (first IVF_SAMPLE vec_ids), spherical variant
    (centroids re-normalized, assignment by max dot = cosine).

    Fit-small / apply-distributed: the sample is O(IVF_SAMPLE·d)
    regardless of corpus size — at 100 TB the training cost is unchanged
    and only the (distributed, single-pass) assignment scales.
    """
    S = _sample_matrix(emb)
    return _lloyd_spherical(S)


def _sample_matrix(emb: DataFrame) -> "np.ndarray":  # noqa: F821
    """Deterministic normalized training sample (first IVF_SAMPLE ids)."""
    import numpy as np

    order_col = "vec_id" if "vec_id" in emb.columns else emb.columns[0]
    rows = emb.orderBy(order_col).limit(IVF_SAMPLE).select("e").toPandas()["e"]
    S = np.asarray(rows.tolist(), dtype=np.float64)
    S /= np.linalg.norm(S, axis=1, keepdims=True)
    return S


def _lloyd_spherical(S: "np.ndarray") -> "np.ndarray":  # noqa: F821
    import numpy as np

    C = S[:IVF_CLUSTERS].copy()  # deterministic init: first k sample vectors
    for _ in range(IVF_ITERS):
        assign = (S @ C.T).argmax(axis=1)
        for j in range(IVF_CLUSTERS):
            members = S[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C /= np.linalg.norm(C, axis=1, keepdims=True)
    return C


def _spread_sample_matrix(emb: DataFrame) -> "np.ndarray":  # noqa: F821
    """Deterministic sample SPREAD across the whole id space (ordered by
    xxhash64(vec_id), not by id) — the calibration sample.  The training
    sample's first-N-ids convention is fine for fitting centroids, but
    calibration must see corpus-representative NEIGHBOR PAIRS: on a
    corpus grown by appends the low ids are the oldest slice and carry
    none of the new arrivals' density."""
    import numpy as np

    order_col = "vec_id" if "vec_id" in emb.columns else emb.columns[0]
    rows = (
        emb.orderBy(F.xxhash64(F.col(order_col)))
        .limit(IVF_SAMPLE)
        .select("e")
        .toPandas()["e"]
    )
    S = np.asarray(rows.tolist(), dtype=np.float64)
    S /= np.linalg.norm(S, axis=1, keepdims=True)
    return S


def calibrate_nprobe(
    S: "np.ndarray",  # noqa: F821
    centroids: "np.ndarray",  # noqa: F821
    target_recall: float = 0.95,
) -> int:
    """MEASURED probe count: the smallest p at which each calibration
    vector's exact nearest neighbor (within the sample) lands in one of
    the vector's top-p cells, at ``target_recall`` coverage.

    This is the auto-tune for the static-nprobe gap: a diffuse corpus
    (neighbors near Voronoi boundaries — low cos-to-centroid) yields a
    flat cell-affinity profile and the curve crosses the target later,
    so p rises by measurement instead of manual retuning; a clustered
    corpus keeps the cheap default.  Pure driver-side numpy on
    ≤ IVF_SAMPLE rows — O(n² + n·k), independent of corpus size.
    Clamped to [IVF_NPROBE, n_cells].
    """
    import numpy as np

    sims = S @ centroids.T  # (n, k_cells)
    cell_rank = np.argsort(-sims, axis=1)
    assign = cell_rank[:, 0]
    G = S @ S.T
    np.fill_diagonal(G, -np.inf)
    nn_cell = assign[G.argmax(axis=1)]
    pos = (cell_rank == nn_cell[:, None]).argmax(axis=1)  # 0-based rank
    k_cells = centroids.shape[0]
    for p in range(IVF_NPROBE, k_cells + 1):
        if float((pos < p).mean()) >= target_recall:
            return p
    return k_cells


def _cv_quantization_baseline(S: "np.ndarray") -> float:  # noqa: F821
    """Generalization-corrected quantization quality: fit a twin
    quantizer on the first half of the training sample, evaluate mean
    max-cosine on the second half.  The in-index mean cos is optimistic
    (the sample-fit k-means SAW those vectors — on a corpus no bigger
    than IVF_SAMPLE, all of them), so a drift monitor comparing fresh
    batches against it reads the train/holdout gap as phantom drift;
    the cross-fit estimate is what an unseen same-distribution batch
    actually scores.  Pure driver-side numpy on ≤ IVF_SAMPLE rows."""
    half = len(S) // 2
    if half < IVF_CLUSTERS:
        # micro-corpus (< 2k vectors): no held-out half to cross-fit on;
        # fall back to the optimistic in-sample value rather than a
        # fabricated constant
        C = _lloyd_spherical(S)
        return float((S @ C.T).max(axis=1).mean())
    C = _lloyd_spherical(S[:half])
    return float((S[half:] @ C.T).max(axis=1).mean())


def _assign_clusters(df: DataFrame, vec_col: str, centroids, n: int) -> DataFrame:
    """Arrow-batched GEMM assignment: each vector's top-n centroids by
    cosine, exploded to (row ⨯ cluster).  n=1 indexes the corpus;
    n=IVF_NPROBE fans a query out to the clusters it probes."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(df.schema.fields + [StructField("cluster", LongType())])
    C = centroids  # closure-captured (k×d, tiny — ships with the task)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            M /= np.linalg.norm(M, axis=1, keepdims=True)
            top = np.argsort(-(M @ C.T), axis=1)[:, :n]  # (rows, n)
            rep = pdf.loc[pdf.index.repeat(n)].reset_index(drop=True)
            rep["cluster"] = top.ravel().astype("int64")
            yield rep

    return df.mapInPandas(gen, out_schema)


# --- fused Lloyd model updates (r13 optimization) ----------------------------
#
# One Lloyd iteration used to cost: broadcast-build the codebook table,
# join it across every (row × candidate), evaluate the interpreted
# higher-order `_l2_expr` fold per candidate, shuffle to argmin per row,
# posexplode, and shuffle again to the (group, code, pos) sums.  These
# two helpers fuse assignment + partial aggregation into ONE Arrow stage
# (guide §4.2) whose output is ≤ model-size partial rows per task — the
# shuffle then carries k·d partials instead of n·k candidates (§2.3),
# which is also the correct 100 TB dataflow (map-side-combined model
# update).  Arithmetic faithfulness to the forms they replaced:
# - L2 distances accumulate LEFT-TO-RIGHT over the subvector axis (the
#   `_seq_d2` fold `_l2_expr` encoded); ties argmin to the lowest code
#   (= Catalyst min(struct(d2, cid)));
# - cosine assignment is argmax of M @ Cᵀ with first-max tie-break (the
#   numpy reference contract in tests/test_kmeans.py);
# - the cross-task sums stay SPARK-aggregated (one tiny groupBy), and
#   the callers' ROUND grids absorb sub-ulp partial-order noise exactly
#   as before (differentials: tests/test_pq.py, tests/test_kmeans.py).


def _lloyd_partial_stats(df: DataFrame, group_col: str, vec_col: str, C) -> list:
    """Collected (g, code, pos, s, n) model update for subspace-grouped
    L2 Lloyd (PQ): ``C`` is (m, k, d_sub); ``df`` carries one subvector
    slice per row.  ``n`` is the member count (read it on pos == 0)."""
    import numpy as np
    import pandas as pd

    m, k, dsub = C.shape
    Cb = C

    def gen(batches):
        sums = np.zeros((m, k, dsub), dtype=np.float64)
        counts = np.zeros((m, k), dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            g = pdf[group_col].to_numpy(dtype="int64")
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            Cg = Cb[g]  # (rows, k, d_sub)
            d2 = np.zeros((len(pdf), k), dtype=np.float64)
            for j in range(dsub):  # left-to-right fold order
                d2 += (X[:, None, j] - Cg[:, :, j]) ** 2
            a = d2.argmin(axis=1)  # ties -> lowest code
            np.add.at(sums, (g, a), X)
            np.add.at(counts, (g, a), 1)
        if seen:
            gg = np.repeat(np.arange(m, dtype="int64"), k * dsub)
            cc = np.tile(np.repeat(np.arange(k, dtype="int64"), dsub), m)
            pp = np.tile(np.arange(dsub, dtype="int64"), m * k)
            yield pd.DataFrame(
                {"g": gg, "code": cc, "pos": pp, "s": sums.ravel(), "n": counts[gg, cc]}
            )

    out = df.mapInPandas(gen, "g bigint, code bigint, pos bigint, s double, n bigint")
    return (
        out.groupBy("g", "code", "pos")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .collect()
    )


def _lloyd_partial_stats_cosine(
    df: DataFrame, vec_col: str, C, renormalize: bool = True
) -> list:
    """Collected (cluster, pos, s, n) model update for spherical k-means:
    assignment by argmax cosine against ``C`` (k, d) — the
    `_assign_clusters` arithmetic.  Pass ``renormalize=False`` when the
    input rows are ALREADY unit-norm (`_normalized_emb` output): the
    partial sums then accumulate the stored values bit-faithfully to the
    pre-fusion aggregation (r14, advisor item — the in-kernel divide by
    a ~1.0 norm added ulp drift and would turn a zero-norm row into NaN
    sums where the old path only NaN'd its assignment).  Assignment is
    unaffected either way: row-positive rescaling never changes the
    argmax."""
    import numpy as np
    import pandas as pd

    k, d = C.shape
    Cb = C

    def gen(batches):
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            M = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if renormalize:
                M /= np.linalg.norm(M, axis=1, keepdims=True)
            a = (M @ Cb.T).argmax(axis=1)
            np.add.at(sums, a, M)
            np.add.at(counts, a, 1)
        if seen:
            cc = np.repeat(np.arange(k, dtype="int64"), d)
            pp = np.tile(np.arange(d, dtype="int64"), k)
            yield pd.DataFrame(
                {"cluster": cc, "pos": pp, "s": sums.ravel(), "n": counts[cc]}
            )

    out = df.mapInPandas(gen, "cluster bigint, pos bigint, s double, n bigint")
    return (
        out.groupBy("cluster", "pos")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .collect()
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids,
    k: int = TOPK,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF ANN: probe the query's IVF_NPROBE nearest clusters, exact
    cosine re-rank inside them.

    Recall comes from probing multiple cells (a near neighbor can sit
    just across a Voronoi boundary); cost is ~NPROBE/CLUSTERS of brute
    force.  At 100 TB: cluster ids are precomputed and the corpus is
    PARTITIONED BY cluster, so a probe reads only its cells' files —
    partition pruning does the candidate generation.
    """
    c_assigned = _assign_clusters(corpus, "e", centroids, 1)
    q_probes = _assign_clusters(queries, "qe", centroids, nprobe)
    cand = (
        c_assigned.join(F.broadcast(q_probes), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qe", "vec_id", "e")
        .distinct()  # a corpus vector can match ≤1 cell here, but stay safe
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.withColumn("cosine", F.round(cosine_expr(F.col("e"), F.col("qe")), 6))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cosine")
    )


def ivf_topk_fixture(spark: SparkSession, sf_dir: str, k: int = TOPK) -> DataFrame:
    """IVF ANN over the embeddings fixture, vec_id<3 as queries."""
    emb = _emb(spark, sf_dir)
    corpus = emb.select("vec_id", "e")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    centroids = _train_centroids_sample(emb)
    return ivf_topk(corpus, queries, centroids, k)


def ann_both_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both ANN indexes (hyperplane-LSH and IVF) over the fixture, one
    tagged result — a single registered rows-only cert covers the pair so
    every operator fits the driver's 50-query correctness window.  The
    recall-vs-brute-force contracts live in tests/test_similarity.py."""
    lsh = ann_topk_fixture(spark, sf_dir).select(
        F.lit("lsh").alias("method"), "query_id", "vec_id", "cosine"
    )
    ivf = ivf_topk_fixture(spark, sf_dir).select(
        F.lit("ivf").alias("method"), "query_id", "vec_id", "cosine"
    )
    return lsh.unionByName(ivf).orderBy("method", "query_id", F.desc("cosine"), "vec_id")


# LOCAL rows-only / recall-tested: approximate results are deterministic
# (seeded planes / deterministic sample-fit k-means) but not portably
# SQL-expressible, so this can never earn a driver hash — it lives in the
# standalone registry (recall contracts: tests/test_similarity.py) and its
# former driver slot certifies an oracled operator instead.
STANDALONE_QUERIES["sim_ann_topk"] = ann_both_fixture


# --------------------------------------------------------------------------
# Embedding int8 quantization — round 3
# --------------------------------------------------------------------------

_QUANTIZE_SQL = """
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS sc
  FROM embeddings
)
SELECT vec_id, CAST(t.i - 1 AS INT) AS pos,
       CAST(CASE WHEN sc = 0 THEN 0
            ELSE floor(127.0 * CAST(embedding[t.i] AS DOUBLE) / sc + 0.5)
            END AS INT) AS q,
       round(sc, 6) AS scale
FROM s, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t
ORDER BY vec_id, pos
"""


@_register("emb_quantize_int8", _QUANTIZE_SQL)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column.

    ``q = floor(127 * x / max|x| + 0.5)`` — the standard absmax scheme
    that shrinks an f32 vector store 4x (the real win at 100 TB is that
    ANN candidate generation reads a quarter of the bytes; re-rank can
    rehydrate f32 for the shortlist).  ``floor(x + 0.5)`` instead of
    ``round`` pins identical half-way behavior across engines.  The cert
    explodes to (vec_id, pos, q) rows because array terminals are not
    canon-safe; the pipeline form (`quantize_vec`) keeps the array.

    Map-only: no shuffle anywhere — quantization of a 100 TB store is
    one narrow pass.  The presentation sort runs on the COMPACT vector
    frame (one row per vector) BEFORE the posexplode: explode emits each
    row's positions contiguously in array order and narrow stages
    preserve the sort's range partitioning, so the exploded output is
    already globally (vec_id, pos)-ordered — sorting dim× fewer rows
    than an orderBy after the explode (~25% off warm sf0.1 wall-clock).
    """
    emb = load_table(spark, sf_dir, "embeddings").orderBy("vec_id")
    sc = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    out = emb.select(
        "vec_id", sc.alias("sc"), F.posexplode("embedding").alias("pos", "x")
    )
    q = (
        F.when(F.col("sc") == 0, F.lit(0))
        .otherwise(
            F.floor(F.lit(127.0) * F.col("x").cast("double") / F.col("sc") + 0.5)
        )
        .cast("int")
    )
    return out.select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        q.alias("q"),
        F.round("sc", 6).alias("scale"),
    )


def quantize_vec(df: DataFrame, vec_col: str) -> DataFrame:
    """Pipeline form of int8 quantization: keeps the quantized array +
    scale alongside the row (array terminals stay internal)."""
    sc = F.array_max(F.transform(vec_col, lambda x: F.abs(x.cast("double"))))
    qarr = F.transform(
        vec_col,
        lambda x: F.when(sc == 0, F.lit(0))
        .otherwise(F.floor(F.lit(127.0) * x.cast("double") / sc + 0.5))
        .cast("int"),
    )
    return df.withColumn("q_vec", qarr).withColumn("q_scale", sc)


# --------------------------------------------------------------------------
# Semantic dedup: cluster-and-keep-representative — round 3
# --------------------------------------------------------------------------


def semantic_dedup(corpus: DataFrame, centroids) -> DataFrame:
    """Cluster embeddings with the IVF coarse quantizer and keep one
    canonical representative per cluster (the member closest to its
    centroid; vec_id tiebreak).

    The cluster-level twin of MinHash dedup: near-duplicate *meaning*
    collapses to the same Voronoi cell even when the text differs too
    much for shingle overlap.  Reuses the sample-fit k-means + Arrow
    GEMM assignment from the IVF index, so the semantic-dedup pass and
    the ANN index share one clustering at scale.

    Shape: one map stage (assignment), one shuffle on cluster (the
    ranking window) — cluster count bounds the reduce-side state, and a
    100 TB corpus raises cluster count, not per-cluster memory.
    """
    import numpy as np

    spark = corpus.sparkSession
    assigned = _assign_clusters(corpus, "e", centroids, 1)
    cent_rows = [
        (int(j), [float(v) for v in centroids[j]])
        for j in range(len(centroids))
    ]
    cent = local_df(spark, cent_rows, "cluster bigint, ce array<double>")
    scored = assigned.join(cent, "cluster").select(
        "vec_id",
        "cluster",
        F.round(cosine_expr(F.col("e"), F.col("ce")), 6).alias("cos_to_centroid"),
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc("cos_to_centroid"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .select(
            "vec_id",
            "cluster",
            "cos_to_centroid",
            F.when(F.col("rn") == 1, 1).otherwise(0).cast("int").alias("is_canonical"),
        )
        .orderBy("vec_id")
    )


def semantic_dedup_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup over the embeddings fixture (deterministic
    sample-fit centroids — same quantizer as the IVF index)."""
    emb = _emb(spark, sf_dir)
    centroids = _train_centroids_sample(emb)
    return semantic_dedup(emb.select("vec_id", "e"), centroids)


STANDALONE_QUERIES["dedup_semantic"] = semantic_dedup_fixture


# --------------------------------------------------------------------------
# Persisted IVF index: the partition-pruned search the docstrings promise
# --------------------------------------------------------------------------

_INDEX_LEASE = "_LEASE"
#: acquisition patience — must exceed the worst live batch append
#: (seconds locally; minutes at production batch sizes), because a LIVE
#: holder genuinely owns the lock for its whole write and a contender
#: can only wait.  A long timeout is safe now that crashed holders cost
#: ZERO wait: the kernel drops their ``flock`` the instant the process
#: dies, so patience never means waiting on a corpse (r12's
#: mtime-staleness heuristic — and its stat→remove break race, where
#: two contenders could both judge a lease stale and the loser's
#: ``os.remove`` deleted the winner's FRESH lease — are gone entirely;
#: there is no break path left to race).
_LEASE_TIMEOUT_SEC = 600.0
_LEASE_POLL_SEC = 0.05


class _IndexLease:
    """A held writer lease: the ``flock``-ed fd plus the lease path.
    Opaque token — create via ``_acquire_index_lease``, dispose via
    ``_release_index_lease``."""

    __slots__ = ("path", "fd")

    def __init__(self, path: str, fd: int):
        self.path = path
        self.fd = fd


def _acquire_index_lease(path: str, owner: str) -> _IndexLease:
    """Take the index's writer lease — an exclusive kernel ``flock`` on
    a permanent ``_LEASE`` file at the index top (shared by every
    generation).  This is what makes the append/rebuild race guard
    AIRTIGHT rather than merely narrow: every appender holds the lease
    from live-root resolution through its codes/corpus write, and the
    rebuild holds it across watermark re-check + manifest flip — the
    interleaving that loses an append cannot be scheduled.  Training
    itself runs WITHOUT the lease (it is minutes long; racing appends
    during it are caught by the watermark re-check and refuse the
    flip).

    The lock is kernel-managed (``fcntl.flock``), which buys the two
    properties a filename protocol cannot give:

    * **crash release is instant and automatic** — a holder that dies
      drops its lock with its last fd, so there is no staleness window
      to guess at and no break path for contenders to race on (the r12
      ``O_EXCL``+mtime scheme let two contenders both judge a lease
      stale; after the first broke and re-created it, the second's
      queued ``os.remove`` deleted the FRESH lease — two holders);
    * **mutual exclusion is per open-file-description**, so it holds
      across processes and within one (two ``open()`` calls conflict).

    The ``_LEASE`` file is created once and NEVER unlinked (unlinking
    a lock file reopens the classic two-holders-via-orphaned-inode
    race); its json body records the current holder purely for the
    timeout diagnostic.  Local-path-only, like the manifest it guards
    (``flock`` on NFS/object stores is not trustworthy — the same
    documented extension point as ``_require_local_index_path``).
    Contention past ``_LEASE_TIMEOUT_SEC`` raises with the holder's
    identity rather than deadlocking."""
    import fcntl
    import json
    import os
    import time

    _require_local_index_path(path)
    os.makedirs(path, exist_ok=True)
    lease = os.path.join(path, _INDEX_LEASE)
    fd = os.open(lease, os.O_CREAT | os.O_RDWR)
    deadline = time.monotonic() + _LEASE_TIMEOUT_SEC
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except BlockingIOError:
                if time.monotonic() >= deadline:
                    try:
                        with open(lease) as f:
                            held = f.read() or "<unidentified holder>"
                    except OSError:
                        held = "<unidentified holder>"
                    raise TimeoutError(
                        f"index writer lease at {lease!r} held past "
                        f"{_LEASE_TIMEOUT_SEC}s by {held}; the holder is "
                        "alive (a dead holder's lock releases instantly) — "
                        "wait for its write to finish or raise the timeout"
                    )
                time.sleep(_LEASE_POLL_SEC)
                continue
            # lock held — record holder identity for the diagnostic
            os.ftruncate(fd, 0)
            os.write(
                fd, json.dumps({"owner": owner, "pid": os.getpid()}).encode()
            )
            return _IndexLease(lease, fd)
    except BaseException:
        os.close(fd)
        raise


def _release_index_lease(lease: _IndexLease) -> None:
    """Drop the lease: clear the holder record, then close the fd
    (closing releases the ``flock``).  The lease FILE stays — see
    ``_acquire_index_lease`` on why it is never unlinked."""
    import os

    try:
        os.ftruncate(lease.fd, 0)
    finally:
        os.close(lease.fd)


def _with_index_lease(fn):
    """Run an appender under the index writer lease: held from before
    the live-root resolve until its codes/corpus write has fully
    landed, so a concurrent rebuild's check+flip (also under the lease)
    can never interleave into the window where an append would vanish
    into a just-retired generation."""
    import functools

    @functools.wraps(fn)
    def wrapper(spark, path, *args, **kwargs):
        lease = _acquire_index_lease(path, owner=fn.__name__)
        try:
            return fn(spark, path, *args, **kwargs)
        finally:
            _release_index_lease(lease)

    return wrapper


def _ivf_append_mark(live_root: str) -> frozenset:
    """Append watermark for the raw-vector IVF family: the data-file
    NAME SET of the live generation's ``corpus`` directory (a pure
    namespace walk, O(#files), no parquet read).  ``mode=append``
    writes have no batch protocol to count, but every append must
    create at least one new part file, so name-set equality before the
    flip proves no append landed after the rebuild's corpus snapshot —
    the same guard the batch-partitioned families get from
    ``_next_batch_id`` (r11 left this family prose-only)."""
    import os

    root = os.path.join(live_root, "corpus")
    out = []
    for dirpath, _dirs, files in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        out += [
            os.path.join(rel, f) for f in files if not f.startswith(("_", "."))
        ]
    return frozenset(out)



def build_ivf_index(spark: SparkSession, path: str, corpus: DataFrame) -> None:
    """Materialize the IVF index: corpus rows written hive-partitioned by
    their nearest-centroid cluster, centroids saved beside them.

    This is the at-rest form `ivf_topk`'s docstring promises for 100 TB:
    cluster assignment happens ONCE at index-build (one Arrow GEMM pass),
    and every later search prunes to its probed cells at PLANNING time —
    the directory layout is the candidate generator, no per-search
    assignment of the corpus.  Rebuild cadence is the corpus's dedup/
    compaction cadence; the centroid table is k×d (tiny, versioned with
    the layout so index and data can never skew).
    """
    import os

    S = _sample_matrix(corpus)
    centroids = _lloyd_spherical(S)
    assigned = _assign_clusters(corpus, "e", centroids, 1)
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(
        os.path.join(path, "corpus")
    )
    centroid_df = local_df(
        spark,
        [(i, row.tolist()) for i, row in enumerate(centroids)],
        "cluster long, centroid array<double>",
    )
    centroid_df.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    # drift-monitor baseline: the CROSS-FIT quantization quality (what an
    # unseen same-distribution batch scores), plus the in-index mean for
    # reference — see _cv_quantization_baseline for why not the latter
    in_index = _quantization_fit(
        spark.read.parquet(os.path.join(path, "corpus")), centroid_df
    ).collect()[0]
    # adaptive-nprobe calibration: measured on a SPREAD sample so probe
    # count tracks the corpus's actual neighbor geometry (diffuse →
    # more probes, clustered → the cheap default)
    rec_nprobe = calibrate_nprobe(_spread_sample_matrix(corpus), centroids)
    spark.createDataFrame(
        [
            (
                _cv_quantization_baseline(S),
                float(in_index["mean_cos"]),
                int(in_index["n"]),
                int(rec_nprobe),
            )
        ],
        "baseline_mean_cos double, in_index_mean_cos double, n bigint,"
        " recommended_nprobe bigint",
    ).write.mode("overwrite").parquet(os.path.join(path, "stats"))


def _quantization_fit(assigned: DataFrame, centroid_df: DataFrame) -> DataFrame:
    """Mean cosine of assigned vectors to their centroid — the scalar
    that says how well the quantizer still fits the data it indexes.
    One broadcast join + one global avg; never a collect of vectors."""
    from data_ingestion_backend_spark.operators.dedup import cosine_expr

    return assigned.join(F.broadcast(centroid_df), "cluster").agg(
        F.avg(cosine_expr(F.col("e"), F.col("centroid"))).alias("mean_cos"),
        F.count(F.lit(1)).alias("n"),
    )


@_with_index_lease
def append_to_ivf_index(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    drift_tol: float = 0.05,
) -> dict:
    """Incremental IVF maintenance: absorb a batch of new vectors into
    the existing index WITHOUT retraining — the ANN twin of
    ``dedup_incremental``.

    The batch is assigned with the index's frozen quantizer (one Arrow
    GEMM pass over the batch only) and appended into its cells' hive
    partitions — the at-rest corpus is never re-read, never re-assigned,
    never rewritten; daily cost is O(|batch|·k·d), independent of index
    size.  Because the quantizer is frozen, a search after append is
    IDENTICAL to an in-memory IVF over the grown corpus with the same
    centroids (golden-tested), and partition pruning keeps working — new
    files land inside existing ``cluster=N/`` directories.

    Frozen quantizers rot: if the incoming distribution shifts, new
    vectors land far from every centroid and recall decays silently.
    The drift monitor compares the BATCH's mean cos-to-assigned-centroid
    against the build-time baseline (stored in ``stats``): a drop
    > ``drift_tol`` sets ``retrain=True`` — the signal to rebuild the
    index (``build_ivf_index`` on the grown corpus) at the next
    maintenance window.  Returns
    ``{baseline_mean_cos, batch_mean_cos, drift, retrain}``.

    The baseline is the build-time CROSS-FIT quantization quality
    (``_cv_quantization_baseline``), not the in-index mean: the in-index
    value is optimistic by the quantizer's train/holdout gap (~0.11 on
    the 64-dim fixture), which a naive monitor reads as phantom drift on
    every same-distribution batch.  Against the cross-fit baseline a
    same-distribution batch reads ≈0 drift and a genuine shift reads
    its full displacement, so the tight default tolerance works.  A
    deployment should still calibrate from the returned readings of its
    first few known-good batches (the appended batch is absorbed either
    way — the monitor signals, it does not gate).
    """
    import os

    import numpy as np

    path = _index_root(path)
    crows = (
        spark.read.parquet(os.path.join(path, "centroids"))
        .orderBy("cluster")
        .collect()
    )
    C = np.asarray([r["centroid"] for r in crows], dtype=np.float64)
    centroid_df = spark.read.parquet(os.path.join(path, "centroids"))
    # one GEMM pass over the batch; pinned because both the stats agg and
    # the cell write consume it
    assigned = _assign_clusters(new_vectors, "e", C, 1).localCheckpoint(eager=True)
    batch = _quantization_fit(assigned, centroid_df).collect()[0]
    baseline = spark.read.parquet(os.path.join(path, "stats")).collect()[0]
    assigned.write.mode("append").partitionBy("cluster").parquet(
        os.path.join(path, "corpus")
    )
    drift = float(baseline["baseline_mean_cos"]) - float(batch["mean_cos"])
    return {
        "baseline_mean_cos": float(baseline["baseline_mean_cos"]),
        "batch_mean_cos": float(batch["mean_cos"]),
        "drift": drift,
        "retrain": drift > drift_tol,
    }


def ivf_search_persisted(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = TOPK,
    nprobe: int | None = None,
) -> DataFrame:
    """Search the persisted index: assign each query its probe cells,
    then scan ONLY those cells' directories (`cluster IN (...)` is
    a partition-column filter, so pruning happens at planning time —
    pinned by `test_ivf_persisted_prunes_partitions`) and exact-rerank.

    ``nprobe`` defaults to the index's CALIBRATED ``recommended_nprobe``
    (measured at build on the spread sample — see ``calibrate_nprobe``),
    falling back to the static IVF_NPROBE for pre-calibration indexes.

    The probed-cell id list is a control-plane scalar set (≤ |query
    batch|·nprobe ints, same footing as the 1024-row centroid sample);
    the corpus never reaches the driver.
    """
    import os

    import numpy as np

    path = _index_root(path)
    crows = (
        spark.read.parquet(os.path.join(path, "centroids"))
        .orderBy("cluster")
        .collect()
    )
    C = np.asarray([r["centroid"] for r in crows], dtype=np.float64)
    if nprobe is None:
        stats = spark.read.parquet(os.path.join(path, "stats"))
        nprobe = (
            int(stats.collect()[0]["recommended_nprobe"])
            if "recommended_nprobe" in stats.columns
            else IVF_NPROBE
        )
    q_probes = _assign_clusters(queries, "qe", C, nprobe)
    probe_ids = sorted(
        r["cluster"] for r in q_probes.select("cluster").distinct().collect()
    )
    corpus = spark.read.parquet(os.path.join(path, "corpus")).filter(
        F.col("cluster").isin(probe_ids)
    )
    cand = (
        corpus.join(F.broadcast(q_probes), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qe", "vec_id", "e")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.withColumn("cosine", F.round(cosine_expr(F.col("e"), F.col("qe")), 6))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cosine")
    )


# --- distributed k-means training (full-corpus Lloyd) -----------------------
#
# The IVF quantizer above fits on a bounded driver-side sample — the right
# call when a 1024-vector sample characterizes the distribution.  When it
# does not (fine-grained cluster structure, heavy tails, k in the
# thousands), the trainer itself must be distributed: every Lloyd
# iteration is (1) the same Arrow GEMM assignment stage the IVF index
# uses, over the WHOLE corpus, and (2) one groupBy(cluster, dim) partial
# aggregation whose map-side combine reduces the shuffle to
# n_partitions × k × d rows — the k×d sums that reach the driver are the
# model, not the data.  Per-iteration driver traffic is O(k·d), corpus
# traffic is one scan + one combine-compressed shuffle: the canonical
# scalable k-means dataflow (same shape as MLlib's, re-expressed on the
# public DataFrame API with spherical/cosine semantics to match the rest
# of the similarity family).
#
# Determinism pins (so the numpy differential and re-runs are bit-stable):
# init = first KMEANS_K vec_ids; centroids rounded to 9 dp after every
# driver-side recompute, so sub-ulp float-summation-order differences
# (Spark partial sums vs numpy) cannot leak into the next assignment.

KMEANS_K, KMEANS_ITERS = 16, 5
KMEANS_ROUND = 9


def _normalized_emb(emb: DataFrame) -> DataFrame:
    """vec_id + L2-normalized double vector (pure Catalyst)."""
    norm = F.sqrt(
        F.aggregate("e", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return emb.select(
        "vec_id", F.transform("e", lambda x: x / norm).alias("e")
    )


def kmeans_train(
    emb: DataFrame, k: int = KMEANS_K, iters: int = KMEANS_ITERS
):
    """Full-corpus spherical k-means: returns (centroids k×d ndarray,
    counts length-k ndarray) after ``iters`` Lloyd iterations.

    ``emb`` must have (vec_id, e: array<double>).  The corpus is scanned
    once per iteration (persisted normalized form), assignment is the
    Arrow-batched GEMM stage, and the recompute aggregation ships only
    k·d partial sums per partition thanks to map-side combine.
    """
    import numpy as np

    emb_n = _normalized_emb(emb).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        init = (
            emb_n.orderBy("vec_id").limit(k).select("e").toPandas()["e"].tolist()
        )
        C = np.round(np.asarray(init, dtype=np.float64), KMEANS_ROUND)
        counts = np.zeros(k, dtype=np.int64)
        # r13 (optimization): one fused Arrow stage per iteration — see
        # `_lloyd_partial_stats_cosine` (assignment + per-task partial
        # sums in one pass; the shuffle carries k·d partials per task
        # instead of the posexploded n·d rows).
        vec_only = emb_n.select("e")
        for _ in range(iters):
            stats = _lloyd_partial_stats_cosine(
                vec_only, "e", C, renormalize=False  # input is unit-norm
            )
            sums = np.zeros((k, C.shape[1]), dtype=np.float64)
            counts = np.zeros(k, dtype=np.int64)
            for r in stats:
                sums[r["cluster"], r["pos"]] = r["s"]
                if r["pos"] == 0:
                    counts[r["cluster"]] = r["n"]
            newC = C.copy()  # empty clusters keep their previous centroid
            nz = counts > 0
            newC[nz] = sums[nz] / counts[nz, None]
            newC /= np.linalg.norm(newC, axis=1, keepdims=True)
            C = np.round(newC, KMEANS_ROUND)
        return C, counts
    finally:
        # bench loops / soaks call this repeatedly in one session —
        # cached Lloyd inputs must not accumulate across invocations
        emb_n.unpersist()


@_register_standalone("sim_kmeans_train", None)  # iterative — rows-only cert
def sim_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained full-corpus quantizer as a table: (cluster, pos, centroid,
    n_members), k·d rows.  Rows-only in the uniform gate (Lloyd is
    iterative, not SQL-expressible); the numpy differential golden in
    ``tests/test_kmeans.py`` certifies the values, and determinism is
    pinned by the rounding discipline above."""
    C, counts = kmeans_train(_emb(spark, sf_dir))
    rows = [
        (int(j), int(p), float(C[j, p]), int(counts[j]))
        for j in range(C.shape[0])
        for p in range(C.shape[1])
    ]
    return local_df(
        spark, rows, "cluster bigint, pos bigint, centroid double, n_members bigint"
    ).orderBy("cluster", "pos")


# --- distributed PCA over embeddings ----------------------------------------
#
# Dimensionality reduction for embedding analytics (cheaper ANN probes,
# drift dashboards, visualization).  The covariance inputs — Gram matrix
# Σ x·xᵀ, mean vector, count — are MERGEABLE per-partition partials: each
# Arrow batch contributes one d×d GEMM (numpy, vectorized), and the
# shuffle carries only n_batches · d(d+1)/2 rows.  The eigendecomposition
# runs driver-side on the d×d covariance (the MODEL, 64×64 here), and the
# projection is the same broadcast-GEMM map stage the rest of the family
# uses.  Corpus traffic: exactly two scans (fit, project), zero explodes.
#
# emb_gram_matrix carries a full DuckDB oracle (the Gram entries are
# plain SQL sums of products); the eigen step is certified by a numpy
# differential (tests/test_pca.py) — the same oracle/differential split
# as the IVF family.

PCA_COMPONENTS = 8
PCA_ROUND = 9  # eigenvector grid — sub-ulp solver noise cannot leak


def _gram_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-batch upper-triangle Gram partials: (i, j, g) with j ≥ i."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            G = M.T @ M
            iu = np.triu_indices(G.shape[0])
            yield pd.DataFrame(
                {
                    "i": iu[0].astype("int64"),
                    "j": iu[1].astype("int64"),
                    "g": G[iu],
                }
            )

    return df.mapInPandas(gen, "i bigint, j bigint, g double")


@_register_standalone(
    "emb_gram_matrix",
    f"""SELECT i - 1 AS i, j - 1 AS j,
              round(SUM(CAST(embedding[i] AS DOUBLE)
                        * CAST(embedding[j] AS DOUBLE)), 6) AS g
       FROM embeddings,
            (SELECT unnest(range(1, {EMB_DIM + 1})) AS i),
            (SELECT unnest(range(1, {EMB_DIM + 1})) AS j)
       WHERE j >= i
       GROUP BY i, j
       ORDER BY i, j""",
)
def emb_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle corpus Gram matrix Σ x·xᵀ as (i, j, g) — the
    mergeable sufficient statistic PCA/covariance analytics fit on.

    The oracle is the naive SQL double-unnest (O(n·d²) rows in DuckDB);
    the Spark side never explodes — each Arrow batch emits one GEMM's
    d(d+1)/2 partials and the combine sums them.
    """
    emb = _emb(spark, sf_dir)
    return (
        _gram_partials(emb, "e")
        .groupBy("i", "j")
        .agg(F.round(F.sum("g"), 6).alias("g"))
        .orderBy("i", "j")
    )


def _pca_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-Arrow-batch PCA sufficient-statistic partials in the
    (i, j, g) row encoding of ``models.PCA_STATE_SCHEMA``: upper-
    triangle Gram entries (j ≥ i), per-dimension sums (i=pos, j=-1),
    and the row count (i=-1, j=-1) — all three emitted by the SAME
    GEMM pass, so a fit or state build reads the corpus exactly once."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            G = M.T @ M
            iu = np.triu_indices(G.shape[0])
            d = G.shape[0]
            yield pd.DataFrame(
                {
                    "i": np.concatenate(
                        [iu[0], np.arange(d), [-1]]
                    ).astype("int64"),
                    "j": np.concatenate(
                        [iu[1], np.full(d, -1), [-1]]
                    ).astype("int64"),
                    "g": np.concatenate(
                        [G[iu], M.sum(axis=0), [float(len(M))]]
                    ),
                }
            )

    return df.mapInPandas(gen, "i bigint, j bigint, g double")


def _decode_state_rows(rows, d: int):
    """(G, s, n) from collected (i, j, g) state rows."""
    import numpy as np

    G = np.zeros((d, d))
    s = np.zeros(d)
    n = 0
    for row in rows:
        i, j, g = row["i"], row["j"], row["g"]
        if i == -1 and j == -1:
            n = int(g)
        elif j == -1:
            s[i] = g
        else:
            G[i, j] = g
            G[j, i] = g
    return G, s, n


def pca_fit(emb: DataFrame, r: int = PCA_COMPONENTS):
    """Fit PCA on the FULL corpus: returns (mu, components) — mean
    vector (d,) and top-``r`` eigenvectors (d×r, descending eigenvalue,
    deterministic sign).  One corpus scan: Gram partials, sum vector,
    and count all ride ``_pca_partials``'s single GEMM pass (the per-
    batch numpy sums land on the same float64 grid as the previous
    Catalyst column sums to well under the PCA_ROUND snap)."""
    G, s, n = _decode_state_rows(_pca_state(emb).collect(), EMB_DIM)
    return _eig_from_stats(G, s, n, r)


def _eig_from_stats(G, s, n: int, r: int):
    """Shared eigen step: covariance from (Gram, sum, count), top-``r``
    eigenvectors with deterministic sign, rounded to the PCA grid."""
    import numpy as np

    mu = s / n
    C = G / n - np.outer(mu, mu)
    w, V = np.linalg.eigh(C)  # ascending
    order = np.argsort(w)[::-1][:r]
    V = V[:, order]
    # deterministic sign: the largest-|coefficient| entry is positive
    for k in range(V.shape[1]):
        jmax = int(np.argmax(np.abs(V[:, k])))
        if V[jmax, k] < 0:
            V[:, k] = -V[:, k]
    return np.round(mu, PCA_ROUND), np.round(V, PCA_ROUND)


def pca_project(df: DataFrame, vec_col: str, mu, V) -> DataFrame:
    """(X - mu) @ V via the broadcast-GEMM map stage → adds ``pc``
    (array<double>, length r) to ``df``."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    out_schema = StructType(
        df.schema.fields + [StructField("pc", ArrayType(DoubleType()))]
    )
    mu_c, V_c = mu, V  # closure-captured model (d + d·r doubles)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            P = np.round((M - mu_c) @ V_c, 6)
            pdf = pdf.copy()
            pdf["pc"] = list(P)
            yield pdf

    return df.mapInPandas(gen, out_schema)


@_register_standalone("emb_pca_project", None)  # eigen step — rows-only
def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus projected onto its own top-PCA_COMPONENTS principal axes:
    (vec_id, comp, value).  The Gram input is separately oracled
    (emb_gram_matrix); the eigendecomposition and projection are
    certified by the numpy differential in tests/test_pca.py."""
    emb = _emb(spark, sf_dir)
    mu, V = pca_fit(emb)
    return (
        pca_project(emb.select("vec_id", "e"), "e", mu, V)
        .select("vec_id", F.posexplode("pc").alias("comp", "value"))
        .select("vec_id", F.col("comp").cast("bigint").alias("comp"), "value")
        .orderBy("vec_id", "comp")
    )


# --- incremental PCA state maintenance --------------------------------------
#
# The Gram matrix, sum vector, and count are MERGEABLE sufficient
# statistics: state(corpus ∪ batch) = state(corpus) + state(batch).  So
# PCA over a growing corpus is maintained, not rebuilt — the same
# persisted-index contract as BM25 and IVF: per-batch cost is
# O(|batch| · d) GEMM + a d²-row merge, the corpus is never rescanned.
#
# All three statistics live in ONE table (see models.PCA_STATE_SCHEMA's
# row encoding) so the state publishes in a single atomic pointer swap —
# a reader can never see a Gram that includes a batch whose count
# excludes it.  Merge caveat (documented, tested): Gram entries are
# float64 sums, so merge order can drift from a monolithic rebuild by
# ~1 ulp per merge; the rebuild-equality golden asserts agreement to
# 1e-9 (far below the PCA_ROUND grid downstream eigenvectors snap to),
# not bit equality — the price of float statistics, vs the integer
# stats BM25 chose.  A corpus needing bit-stable audits would scale the
# embeddings onto an integer grid first (the emb_quantize_int8 path).

PCA_STATE_TABLE = "pca_state"


def _pca_state(emb: DataFrame) -> DataFrame:
    """(i, j, g) encoded sufficient statistics of one corpus/batch —
    one corpus scan: Gram, sums, and count are all rows of the same
    ``_pca_partials`` output, merged by one uniform aggregation."""
    return (
        _pca_partials(emb, "e")
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
    )


def build_pca_state(wh, emb: DataFrame) -> None:
    """Materialize the PCA sufficient statistics for a corpus."""
    wh.publish({PCA_STATE_TABLE: wh.stage(PCA_STATE_TABLE, _pca_state(emb))})


def append_to_pca_state(wh, batch: DataFrame, batch_id: int | None = None) -> None:
    """Absorb an embedding batch into the persisted PCA state.

    A state never built reads as EMPTY, so the first append IS the
    build.  ``batch_id`` opts into the shared exactly-once protocol
    (streaming/txn.py): re-delivered ids are rejected, and a crash
    before the marker makes the re-run rebuild from the intent-pinned
    base version instead of double-counting its own partial commit.
    """
    from data_ingestion_backend_spark.streaming import txn

    base = wh.current_version(PCA_STATE_TABLE)
    if batch_id is not None:
        if batch_id <= txn.last_batch(wh, PCA_STATE_TABLE):
            return
        bases = txn.begin_batch(
            wh,
            PCA_STATE_TABLE,
            batch_id,
            {"state": base},
            tables={"state": PCA_STATE_TABLE},
        )
        base = bases["state"]
    merged = (
        wh.read(PCA_STATE_TABLE, base)
        .unionByName(_pca_state(batch))
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
    )
    wh.publish({PCA_STATE_TABLE: wh.stage(PCA_STATE_TABLE, merged)})
    if batch_id is not None:
        txn.commit_batch(wh, PCA_STATE_TABLE, batch_id)


def pca_fit_from_state(wh, r: int = PCA_COMPONENTS):
    """(mu, components) from the persisted state — same math, same
    determinism pins as :func:`pca_fit`, zero corpus scans."""
    G, s, n = _decode_state_rows(wh.read(PCA_STATE_TABLE).collect(), EMB_DIM)
    return _eig_from_stats(G, s, n, r)


# --- product quantization (PQ): compressed-domain ANN -------------------------
#
# The memory-bound ANN form (Jégou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011): split each d-dim vector into m
# subvectors, k-means each subspace independently, store each vector as
# m small codes (here 8 × 4-bit = 4 bytes vs 64 float64 = 512 bytes, a
# 128× compression), and answer queries with Asymmetric Distance
# Computation — a per-query (m × k) lookup table of exact
# query-to-centroid distances, summed along each corpus vector's codes.
#
# Distributed shape:
# - training runs ALL m subspaces in the SAME jobs (the subvector table
#   carries a `sub` column; assignment is one broadcast join + argmin,
#   the update is one groupBy(sub, code, pos)) — m× fewer driver rounds
#   than looping subspaces, and the per-iteration model traffic is
#   m·k·d_sub = 1 024 rows.
# - the code table replaces the vector column for search; the ADC scan
#   joins it to a broadcast distance table and never touches a float
#   vector — the I/O win PQ exists for.
# - the corpus explode is a bounded ×m fan-out of ID+8-double rows (not
#   the full vector per row), and only during train/encode.
#
# Certification: rows-only in the uniform gate (Lloyd is iterative);
# tests/test_pq.py carries the pure-numpy differential (identical init /
# tie-break / rounding discipline), ADC-vs-exact recall floors, a planted
# ADC arithmetic check, and determinism.

PQ_SUBSPACES, PQ_K, PQ_ITERS = 8, 16, 5
PQ_DSUB = EMB_DIM // PQ_SUBSPACES
#: IVFADC residual-PQ subspace default — the measured dial (SCALE.md §7,
#: tools/recallbench.py): at 25x-diffuse the re-ranked recall climbs
#: 0.51 → 0.64 → 0.89 for m = 8 → 16 → 32 at flat build cost, so the
#: production default consumes the best measurement (2 dims/subspace at
#: EMB_DIM=64 — code bytes per vector = m, still 16x smaller than the
#: raw float vector).  Flat PQ keeps PQ_SUBSPACES=8 (its recon-ratio
#: monitor and numpy differentials are calibrated there); readers of
#: BOTH families recover m from the persisted codebook shape.
IVFADC_SUBSPACES = EMB_DIM // 2
PQ_ROUND = 9  # codebook grid — same discipline as KMEANS_ROUND
PQ_QUERIES = 3  # probe set mirrors sim_multiquery_topk


def _subvector_table(emb: DataFrame, m: int = PQ_SUBSPACES) -> DataFrame:
    """(vec_id, sub, sv: array<double>[d/m]) — every subspace's slice
    in one table, so one plan trains/encodes all m subspaces at once.
    ``m`` is the subspace count (the PQ accuracy/size dial: more
    subspaces = finer quantization = bigger codes)."""
    dsub = EMB_DIM // m
    slices = F.array(
        *[
            F.struct(
                F.lit(s).cast("bigint").alias("sub"),
                F.slice("e", s * dsub + 1, dsub).alias("sv"),
            )
            for s in range(m)
        ]
    )
    return emb.select("vec_id", F.explode(slices).alias("x")).select(
        "vec_id", "x.sub", "x.sv"
    )


def _codebook_df(spark: SparkSession, C) -> DataFrame:
    """Literal (sub, cid, cv) codebook table from the (m, k, d_sub) model
    ndarray — m·k rows, always broadcast."""
    rows = [
        (int(s), int(c), [float(x) for x in C[s, c]])
        for s in range(C.shape[0])
        for c in range(C.shape[1])
    ]
    return local_df(spark, rows, "sub bigint, cid bigint, cv array<double>")


def _l2_expr(a: Column, b: Column) -> Column:
    """Sequential left fold of squared differences — the SAME evaluation
    order the numpy reference loops in, so distances are bit-identical."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_assign(spark: SparkSession, subs: DataFrame, C) -> DataFrame:
    """(vec_id, sub, code, sv): nearest codebook entry per subvector.
    Broadcast join fans each (vec, sub) row across k=16 candidates and
    the min(struct) partial-aggregates it straight back down map-side;
    ties break to the lowest cid (matches numpy argmin)."""
    cb = _codebook_df(spark, C)
    scored = subs.join(F.broadcast(cb), "sub").select(
        "vec_id",
        "sub",
        "sv",
        F.struct(_l2_expr(F.col("sv"), F.col("cv")).alias("d2"), "cid").alias("sc"),
    )
    return (
        scored.groupBy("vec_id", "sub")
        .agg(F.min("sc").alias("m"), F.any_value("sv").alias("sv"))
        .select("vec_id", "sub", F.col("m.cid").alias("code"), "sv")
    )


def pq_train(emb: DataFrame, m: int = PQ_SUBSPACES, k: int = PQ_K, iters: int = PQ_ITERS):
    """Train PQ codebooks on the full corpus → (m, k, d_sub) ndarray.

    Init is the first k vectors by vec_id (the family's deterministic
    convention); each iteration is one assignment pass + one
    groupBy(sub, code, pos) whose output is the 1 024-row model update.
    Empty codes keep their previous centroid; centroids round to the
    PQ_ROUND grid so re-runs and the numpy reference are bit-stable.
    """
    import numpy as np

    dsub = EMB_DIM // m
    subs = _subvector_table(emb, m).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        spark = emb.sparkSession
        init = (
            emb.orderBy("vec_id").limit(k).select("e").toPandas()["e"].tolist()
        )
        M0 = np.asarray(init, dtype=np.float64)
        C = np.round(
            np.stack(
                [M0[:, s * dsub : (s + 1) * dsub] for s in range(m)]
            ),
            PQ_ROUND,
        )
        counts = np.zeros((m, k), dtype=np.int64)
        # r13 (optimization): each Lloyd iteration is ONE fused Arrow
        # stage emitting per-task partial (sub, code, pos) sums + one
        # tiny groupBy — replacing the broadcast-codebook join, the
        # n·m·k-row interpreted `_l2_expr` evaluation, and the
        # posexplode shuffle (guide §4.2: batch per-task work into
        # vectorized numpy; §2.3: aggregate before you shuffle — the
        # shuffle now carries ≤ m·k·d_sub partial rows per task, which
        # is also the honest 100 TB shape).  Arithmetic stays
        # order-faithful to the Catalyst form it replaced: distances
        # accumulate left-to-right over the d_sub axis (the `_seq_d2`
        # fold `_l2_expr` encoded), ties argmin to the lowest cid
        # (= min(struct)), and the final sums remain Spark-aggregated
        # before the PQ_ROUND grid absorbs sub-ulp partial-order noise
        # exactly as before (differentials: tests/test_pq.py).
        sub_slices = subs.select("sub", "sv")
        for _ in range(iters):
            stats = _lloyd_partial_stats(sub_slices, "sub", "sv", C)
            sums = np.zeros((m, k, dsub), dtype=np.float64)
            counts = np.zeros((m, k), dtype=np.int64)
            for r in stats:
                sums[r["g"], r["code"], r["pos"]] = r["s"]
                if r["pos"] == 0:
                    counts[r["g"], r["code"]] = r["n"]
            newC = C.copy()
            nz = counts > 0
            newC[nz] = sums[nz] / counts[nz][:, None]
            C = np.round(newC, PQ_ROUND)
        return C, counts
    finally:
        # repeated trainings in one session (bench loops) must not
        # accumulate cached subvector tables
        subs.unpersist()


def pq_encode(spark: SparkSession, emb: DataFrame, C) -> DataFrame:
    """Corpus code table (vec_id, sub, code) — the compressed index."""
    return _pq_assign(spark, _subvector_table(emb, m=len(C)), C).select(
        "vec_id", "sub", "code"
    )


#: ADC shortlist size before the exact re-rank — the standard
#: IVFADC-style recipe: the compressed scan nominates PQ_SHORTLIST
#: candidates, exact L2 re-ranks only those.  On this near-orthogonal
#: corpus raw-ADC@10 recall is ~0.2 (quantization noise ≈ the spread of
#: the distances themselves), while the 50-candidate shortlist retains
#: most of the true top-10 — measured in tests/test_pq.py.
PQ_SHORTLIST = 50


def pq_topk(
    spark: SparkSession,
    emb: DataFrame,
    C,
    n_queries: int = PQ_QUERIES,
    k: int = TOPK,
    rerank: bool = True,
) -> DataFrame:
    """PQ search: ADC shortlist → exact re-rank (default) or raw ADC.

    With ``rerank`` (the production shape): the compressed code table
    nominates the PQ_SHORTLIST smallest-ADC candidates per query, and
    exact L2 over JUST those candidates (a candidate-bounded join back to
    the vector column) produces (query_id, vec_id, d2).  With
    ``rerank=False``: raw (query_id, vec_id, adc) — the arithmetic-golden
    surface.

    The per-query distance table (n_queries · m · k = 384 rows of EXACT
    query-to-centroid L2) is computed driver-side from the query vectors
    (a control-plane batch, same as the IVF probes) and broadcast; the
    compressed scan touches only the code table.  Scores ride the same
    round(…, 6) terminal as the family's cosine scores.
    """
    import numpy as np

    qrows = (
        emb.filter(F.col("vec_id") < n_queries)
        .orderBy("vec_id")
        .select("vec_id", "e")
        .collect()
    )
    dt_rows = []
    for r in qrows:
        q = np.asarray(r["e"], dtype=np.float64)
        for s in range(C.shape[0]):
            qs = q[s * PQ_DSUB : (s + 1) * PQ_DSUB]
            for c in range(C.shape[1]):
                acc = 0.0
                for x, y in zip(qs, C[s, c]):
                    acc += (x - y) * (x - y)
                dt_rows.append((int(r["vec_id"]), int(s), int(c), float(acc)))
    dtable = local_df(
        spark, dt_rows, "query_id bigint, sub bigint, code bigint, dt double"
    )
    codes = pq_encode(spark, emb, C)
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    shortlist = (
        codes.join(F.broadcast(dtable), ["sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("dt"), 6).alias("adc"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= (PQ_SHORTLIST if rerank else k))
        .select("query_id", "vec_id", "adc")
    )
    if not rerank:
        return shortlist.orderBy("query_id", "adc", "vec_id")
    qdf = local_df(
        spark,
        [(int(r["vec_id"]), [float(x) for x in r["e"]]) for r in qrows],
        "query_id bigint, qe array<double>",
    )
    exact = _l2_expr(F.col("e"), F.col("qe"))
    w2 = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    return (
        shortlist.join(emb.select("vec_id", "e"), "vec_id")
        .join(F.broadcast(qdf), "query_id")
        .select("query_id", "vec_id", F.round(exact, 6).alias("d2"))
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "d2")
        .orderBy("query_id", "d2", "vec_id")
    )


@_register_standalone("sim_pq_topk", None)  # rows-only by design: PQ
# training is iterative Lloyd (not one SQL query) and shortlist answers
# are approximate; the contracts are the numpy codebook/code
# differential, the ADC arithmetic golden, and the re-ranked recall
# floor in tests/test_pq.py
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ search (ADC shortlist + exact re-rank) for the fixture probes."""
    emb = _emb(spark, sf_dir)
    C, _ = pq_train(emb)
    return pq_topk(spark, emb, C)


# --- persisted PQ index: maintained, not rebuilt ------------------------------
#
# The at-rest form of the PQ family, mirroring the IVF index above: the
# codebooks and the 4-byte-per-vector code table are materialized once,
# new batches are encoded with the FROZEN codebooks (one broadcast-join
# pass over the batch only — daily cost independent of index size) and
# appended, and compressed ADC search reads codes only, never a float
# vector.  Frozen codebooks rot like frozen IVF quantizers do, so append
# returns a reconstruction-error drift reading against the build-time
# baseline; as with IVF, the monitor signals — it does not gate — and a
# deployment calibrates the tolerance from its first known-good batches
# (the baseline is in-index fit, which a same-distribution holdout batch
# reads slightly worse than by the train/holdout gap).


def _pq_recon_error(spark: SparkSession, subs_assigned: DataFrame, C) -> float:
    """Mean squared reconstruction error: avg over (vec, sub) of the L2
    distance to the assigned codebook entry — the scalar that says how
    well the frozen codebooks still fit the data they encode."""
    cb = _codebook_df(spark, C).withColumnRenamed("cid", "code")
    return float(
        subs_assigned.join(F.broadcast(cb), ["sub", "code"])
        .agg(F.avg(_l2_expr(F.col("sv"), F.col("cv"))).alias("e"))
        .collect()[0]["e"]
    )


def build_pq_index(
    spark: SparkSession, path: str, corpus: DataFrame, m: int = PQ_SUBSPACES
) -> None:
    """Train codebooks on the corpus and materialize (codebooks, codes,
    stats) — compressed search needs nothing else at query time.  ``m``
    sets the subspace count (readers recover it from the codebook
    table's shape, so searches/appends need no extra state)."""
    import os

    C, _ = pq_train(corpus, m=m)
    _codebook_df(spark, C).write.mode("overwrite").parquet(
        os.path.join(path, "codebooks")
    )
    assigned = _pq_assign(spark, _subvector_table(corpus, m=len(C)), C).localCheckpoint(
        eager=True
    )
    # codes are laid out partitioned by batch_id (the build is batch 0)
    # so appends can be made idempotent: each delivery owns one static
    # partition — see append_to_pq_index.
    assigned.select("vec_id", "sub", "code").withColumn(
        "batch_id", F.lit(0)
    ).write.mode("overwrite").partitionBy("batch_id").parquet(
        os.path.join(path, "codes")
    )
    spark.createDataFrame(
        [(_pq_recon_error(spark, assigned, C),)], "baseline_recon double"
    ).write.mode("overwrite").parquet(os.path.join(path, "stats"))


def _read_codebooks(spark: SparkSession, path: str):
    import os

    import numpy as np

    rows = (
        spark.read.parquet(os.path.join(path, "codebooks"))
        .orderBy("sub", "cid")
        .collect()
    )
    m = max(r["sub"] for r in rows) + 1
    k = max(r["cid"] for r in rows) + 1
    C = np.zeros((m, k, len(rows[0]["cv"])))
    for r in rows:
        C[r["sub"], r["cid"]] = r["cv"]
    return C


def _next_batch_id(spark: SparkSession, codes_path: str) -> int:
    """Next append batch id from the ``batch_id=`` PARTITION DIRECTORY
    names via a Hadoop-FS glob — a pure namespace listing, never a
    parquet scan.  (Spark's metadata-only aggregate rewrite is disabled
    by default, so ``read.parquet().agg(max(batch_id))`` plans one task
    per code FILE and per-append cost would grow with index size; the
    glob touches only directory entries, constant per batch.)  Handles
    both the flat PQ layout (``batch_id=N``) and the IVFADC layout
    (``cluster=C/batch_id=N``)."""
    jvm = spark._jvm
    HPath = jvm.org.apache.hadoop.fs.Path
    fs = HPath(codes_path).getFileSystem(spark._jsc.hadoopConfiguration())
    ids: list[int] = []
    for pat in (codes_path + "/batch_id=*", codes_path + "/*/batch_id=*"):
        statuses = fs.globStatus(HPath(pat))
        if statuses is None:
            continue
        for st in statuses:
            name = st.getPath().getName()
            ids.append(int(name.split("=", 1)[1]))
    return (max(ids) + 1) if ids else 0


@_with_index_lease
def append_to_pq_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    drift_tol: float = 0.5,
    batch_id: int | None = None,
) -> dict:
    """Encode a new batch with the index's frozen codebooks and append its
    codes — the PQ twin of ``append_to_ivf_index``.  Returns
    ``{baseline_recon, batch_recon, drift, retrain}`` where drift is the
    RELATIVE reconstruction-error increase over the build baseline.

    Exactly-once: pass ``batch_id`` (> 0; the build owns batch 0) and a
    re-delivered or crash-retried batch OVERWRITES its own static
    ``batch_id=`` partition instead of appending a second copy — PQ's
    ADC sums every code row per (query, vec), so duplicate codes would
    silently double a vector's distance (IVF tolerates duplicates via
    distinct; PQ cannot).  Without ``batch_id`` the next free id is
    auto-assigned — at-least-once only, since a crash retry gets a
    fresh id (caller owns delivery dedup in that mode).
    """
    import os

    path = _index_root(path)
    C = _read_codebooks(spark, path)
    assigned = _pq_assign(spark, _subvector_table(batch, m=len(C)), C).localCheckpoint(
        eager=True
    )
    batch_recon = _pq_recon_error(spark, assigned, C)
    baseline = float(
        spark.read.parquet(os.path.join(path, "stats")).collect()[0][
            "baseline_recon"
        ]
    )
    codes_path = os.path.join(path, "codes")
    if batch_id is None:
        batch_id = _next_batch_id(spark, codes_path)
    (
        assigned.select("vec_id", "sub", "code")
        .withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(codes_path)
    )
    drift = (batch_recon - baseline) / baseline if baseline > 0 else 0.0
    return {
        "baseline_recon": baseline,
        "batch_recon": batch_recon,
        "drift": drift,
        "retrain": drift > drift_tol,
    }


def _pq_adc_tables_keyed(
    frame: DataFrame, C, key_cols: list[str], vec_col: str
) -> DataFrame:
    """ADC distance tables (``*key_cols``, sub, code, dt) built as an
    Arrow stage keyed by arbitrary BIGINT key columns — the data-plane
    form: a million-query batch never loops on the driver.  The
    codebook is m·k·d_sub floats and closure-ships with the task like
    every GEMM stage here.

    Arithmetic note: the accumulation loops EXPLICITLY over the d_sub
    axis (vectorized over rows × subspaces × codes) so each distance
    sums its squared terms strictly left-to-right — numpy's ``.sum(-1)``
    SIMD-reorders even 8-element reductions, which drifts a last ulp
    from the scalar form.  The table is therefore bit-identical to the
    driver-loop form it replaced (differential-pinned in
    tests/test_pq_persisted.py).
    """
    import numpy as np
    import pandas as pd

    m, k, dsub = C.shape

    def gen(batches):
        subs = np.repeat(np.arange(m, dtype="int64"), k)
        codes = np.tile(np.arange(k, dtype="int64"), m)
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.asarray(pdf[vec_col].tolist(), dtype=np.float64).reshape(
                len(pdf), m, dsub
            )
            dt = np.zeros((len(pdf), m, k), dtype=np.float64)
            for d in range(dsub):  # left-to-right accumulation order
                dt += (Q[:, :, None, d] - C[None, :, :, d]) ** 2
            out = {
                kc: np.repeat(pdf[kc].to_numpy(dtype="int64"), m * k)
                for kc in key_cols
            }
            out["sub"] = np.tile(subs, len(pdf))
            out["code"] = np.tile(codes, len(pdf))
            out["dt"] = dt.ravel()
            yield pd.DataFrame(out)

    schema = (
        ", ".join(f"{kc} bigint" for kc in key_cols)
        + ", sub bigint, code bigint, dt double"
    )
    return frame.select(*key_cols, vec_col).mapInPandas(gen, schema)


def _pq_adc_tables(queries: DataFrame, C) -> DataFrame:
    """Per-query ADC distance tables (query_id, sub, code, dt) — see
    ``_pq_adc_tables_keyed``."""
    return _pq_adc_tables_keyed(queries, C, ["query_id"], "qe")


def pq_search_persisted(
    spark: SparkSession, path: str, queries: DataFrame, k: int = TOPK
) -> DataFrame:
    """Compressed ADC search over the persisted code table:
    (query_id, vec_id, adc), smallest first.  ``queries`` carries
    (query_id, qe); the per-query distance tables are built by the
    ``_pq_adc_tables`` Arrow stage (no driver loop at any query count),
    and the scan reads ONLY the 4-byte codes — the float vectors never
    leave the object store.

    The dt table (|queries|·m·k rows) is broadcast into the code join;
    that holds to ~10⁵ queries per call.  Beyond that, block the query
    set and loop calls — each block's work is independent, which is the
    standard batched-ADC sharding."""
    import os

    path = _index_root(path)
    C = _read_codebooks(spark, path)
    dtable = _pq_adc_tables(queries, C)
    codes = spark.read.parquet(os.path.join(path, "codes"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    return (
        codes.join(F.broadcast(dtable), ["sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("dt"), 6).alias("adc"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "adc")
        .orderBy("query_id", "adc", "vec_id")
    )


# --- IVFADC: coarse cells + residual PQ (Jégou et al. TPAMI 2011, §V) --------
#
# The production composition of the two ANN halves this module already
# carries: a coarse IVF quantizer partitions the corpus into cells
# (partition pruning = candidate generation, exactly ``build_ivf_index``),
# and each vector's RESIDUAL to its cell centroid is PQ-encoded (4-byte
# codes, exactly ``build_pq_index``).  Search probes nprobe cells and
# runs ADC per (query, probed cell) on the residual codebooks — the
# compressed scan reads only the probed cells' code files, so the cost
# is ~nprobe/k_cells of a full ADC scan AND never touches a float
# vector.  Residual encoding is what makes the composition better than
# either half: residuals are small and centered, so the same 4-bit
# codebooks quantize them far more finely than raw vectors.
#
# Determinism pins are inherited wholesale: sample-fit coarse centroids
# (first IVF_SAMPLE ids, Lloyd on numpy), PQ init = first PQ_K residuals
# by vec_id, PQ_ROUND grid, round(adc, 6) terminal, ties to lower
# vec_id.  Certification: numpy end-to-end differential + persisted ≡
# in-memory + partition-pruning plan pin + recall floor
# (tests/test_ivfadc.py); rows-only in the uniform gate like the other
# iterative ANN forms.


def _residualize(
    df: DataFrame, cent_df: DataFrame, vec_col: str
) -> DataFrame:
    """Subtract each row's assigned/probed cell centroid from its
    (already normalized) vector — pure Catalyst zip_with against the
    broadcast k_cells×d centroid table."""
    return df.join(F.broadcast(cent_df), "cluster").withColumn(
        vec_col,
        F.zip_with(vec_col, "centroid", lambda x, c: x - c),
    ).drop("centroid")


def _centroid_df(spark: SparkSession, C) -> DataFrame:
    return local_df(
        spark,
        [(i, [float(x) for x in row]) for i, row in enumerate(C)],
        "cluster long, centroid array<double>",
    )


def _ivfadc_encode(spark: SparkSession, corpus: DataFrame, C, m: int = IVFADC_SUBSPACES):
    """(codes, Cpq): residual-PQ code table (vec_id, cluster, sub,
    code) and the trained residual codebooks, for a coarse quantizer
    ``C``."""
    cent = _centroid_df(spark, C)
    assigned = _assign_clusters(_normalized_emb(corpus), "e", C, 1)
    # consumed by PQ train (iterative) + encode: materialize the
    # residuals once (at warehouse scale this is a staged table, not a
    # local checkpoint)
    resid = _residualize(assigned, cent, "e").localCheckpoint(eager=True)
    Cpq, _ = pq_train(resid.select("vec_id", "e"), m=m)
    codes = (
        _pq_assign(spark, _subvector_table(resid.select("vec_id", "e"), m=len(Cpq)), Cpq)
        .select("vec_id", "sub", "code")
        .join(resid.select("vec_id", "cluster"), "vec_id")
    )
    return codes, Cpq


def _ivfadc_scan(
    codes: DataFrame, dtable: DataFrame, k: int
) -> DataFrame:
    """The shared terminal: probed-cell code rows × broadcast per-
    (query, cell) ADC tables → (query_id, vec_id, adc) top-k."""
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    return (
        codes.join(F.broadcast(dtable), ["cluster", "sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("dt"), 6).alias("adc"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "adc")
        .orderBy("query_id", "adc", "vec_id")
    )


def _normalized_queries(queries: DataFrame) -> DataFrame:
    norm = F.sqrt(F.aggregate("qe", F.lit(0.0), lambda acc, x: acc + x * x))
    return queries.select(
        "query_id", F.transform("qe", lambda x: x / norm).alias("qe")
    )


def ivfadc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = TOPK,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """In-memory IVFADC: train coarse + residual quantizers on
    ``corpus`` (vec_id, e), answer ``queries`` (query_id, qe) with
    per-probed-cell residual ADC.  (query_id, vec_id, adc), smallest
    first; distances are ||q̂ − x̂||² approximations, monotone with
    cosine on the normalized vectors."""
    spark = corpus.sparkSession
    C = _lloyd_spherical(_sample_matrix(corpus))
    codes, Cpq = _ivfadc_encode(spark, corpus, C)
    cent = _centroid_df(spark, C)
    q_probes = _assign_clusters(_normalized_queries(queries), "qe", C, nprobe)
    q_resid = _residualize(q_probes, cent, "qe")
    dtable = _pq_adc_tables_keyed(q_resid, Cpq, ["query_id", "cluster"], "qe")
    return _ivfadc_scan(codes, dtable, k)


def build_ivfadc_index(
    spark: SparkSession, path: str, corpus: DataFrame, m: int = IVFADC_SUBSPACES
) -> None:
    """Materialize the IVFADC index: residual-PQ codes hive-partitioned
    by coarse cell (pruning = candidate generation), coarse centroids,
    residual codebooks, and the calibrated probe count.  ``m`` sets the
    residual-PQ subspace count — the accuracy/size dial (recall vs m is
    measured in SCALE.md); readers recover it from the codebook shape."""
    import os

    S = _sample_matrix(corpus)
    C = _lloyd_spherical(S)
    codes, Cpq = _ivfadc_encode(spark, corpus, C, m=m)
    base_recon = _cv_residual_recon_baseline(spark, corpus, C, m=m)
    # (cluster, batch_id) layout: cluster pruning for search, batch_id
    # partitions for exactly-once appends (the build owns batch 0) —
    # the same protocol as append_to_pq_index
    codes.withColumn("batch_id", F.lit(0)).write.mode(
        "overwrite"
    ).partitionBy("cluster", "batch_id").parquet(os.path.join(path, "codes"))
    _centroid_df(spark, C).write.mode("overwrite").parquet(
        os.path.join(path, "centroids")
    )
    _codebook_df(spark, Cpq).write.mode("overwrite").parquet(
        os.path.join(path, "codebooks")
    )
    rec = calibrate_nprobe(_spread_sample_matrix(corpus), C)
    spark.createDataFrame(
        [(int(rec), float(_cv_quantization_baseline(S)), float(base_recon))],
        "recommended_nprobe bigint, baseline_mean_cos double,"
        " baseline_recon double",
    ).write.mode("overwrite").parquet(os.path.join(path, "stats"))


# --- index generations: the drift monitors' consumer ----------------------
#
# append_to_*_index returns a ``retrain`` flag with measured thresholds;
# this is the path that CONSUMES it.  A rebuild retrains both quantizer
# tiers on the caller's accumulated RAW corpus (codes are lossy — the
# rebuild reads the source of truth, never decodes the index), builds
# the next generation BESIDE the live one, re-runs nprobe calibration,
# and flips a one-line manifest pointer with os.replace — POSIX-atomic,
# so a reader resolves either the old generation or the new one, never
# a half-built directory.  (On an object store the flip is a
# conditional PUT of the same manifest key; the layout is unchanged.)

_INDEX_MANIFEST = "MANIFEST"


def _require_local_index_path(path: str) -> None:
    """Generation-swapped indexes are LOCAL-PATH-ONLY: the manifest
    read/flip uses ``os.path``/``os.replace``, which a non-local scheme
    (``hdfs://``, ``s3a://``) silently misses — every reader and
    appender after a "successful" rebuild would resolve the stale
    pre-rebuild root (the data files themselves go through Spark's
    Hadoop FS and are scheme-agnostic, which makes the miss invisible).
    Fail fast instead; porting the manifest to Hadoop
    ``FileContext.rename(OVERWRITE)`` (HDFS-atomic) or a conditional
    PUT (object stores) is the documented extension point."""
    head = path.split("/", 1)[0]
    if head.endswith(":") or "://" in path[: len(head) + 3]:
        scheme = path.split(":", 1)[0]
        if scheme != "file":
            raise NotImplementedError(
                f"index generations use a local-FS manifest; got scheme "
                f"'{scheme}://' — mount the index locally or port "
                f"_index_root/_publish_index_generation to the Hadoop "
                f"FileContext API first"
            )


def _index_root(path: str) -> str:
    """Live generation root: ``<path>/gen=<n>`` named by the MANIFEST
    pointer, or ``<path>`` itself for a flat (never-rebuilt) index."""
    import json
    import os

    _require_local_index_path(path)
    m = os.path.join(path, _INDEX_MANIFEST)
    if os.path.exists(m):
        with open(m) as f:
            return os.path.join(path, "gen=%d" % json.load(f)["generation"])
    return path


def _publish_index_generation(path: str, gen: int) -> None:
    """Atomically point the index at generation ``gen`` (write-temp +
    rename: readers see the old or the new manifest, nothing between)."""
    import json
    import os

    _require_local_index_path(path)
    tmp = os.path.join(path, _INDEX_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"generation": gen}, f)
    os.replace(tmp, os.path.join(path, _INDEX_MANIFEST))


def _rebuild_index(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    builder,
    codes_dir: str | None = "codes",
) -> int:
    """Shared retrain-and-swap: run ``builder`` into the next generation
    directory beside the live one, then atomically publish.  The live
    generation stays fully readable — and appendable — until the
    manifest flips; a crash before the flip leaves the old index
    untouched and the half-built directory inert.

    WRITER-RACE GUARD (r11; made AIRTIGHT and UNIVERSAL in r12): an
    append that lands in the live generation AFTER the rebuild
    snapshots its corpus would be silently absent from the new
    generation.  The guard snapshots the live generation's append
    watermark on entry — ``_next_batch_id`` (a namespace glob,
    O(#batches)) for the batch-partitioned families (``codes_dir`` set
    — PQ, IVFADC), the corpus-dir data-file NAME SET
    (``_ivf_append_mark``) for the raw-vector IVF family
    (``codes_dir=None``; r11 left it prose-only) — and re-checks it
    before the flip; if either the watermark or the live generation
    itself advanced, the flip is REFUSED with the half-built directory
    left inert and the live index untouched — the caller re-runs the
    rebuild over a corpus that includes the raced batch.  The re-check
    + flip run UNDER the writer lease every appender also holds across
    its own live-root-resolve + write (``_acquire_index_lease``), so
    the r11 residual TOCTOU — an append landing in the microseconds
    between re-check and ``os.replace`` — cannot be scheduled at all
    (race goldens in tests/test_ivfadc_maintenance.py)."""
    import os

    live = _index_root(path)
    gen = 1 if live == path else int(live.rsplit("gen=", 1)[1]) + 1

    def mark():
        if codes_dir is not None:
            return _next_batch_id(spark, os.path.join(live, codes_dir))
        return _ivf_append_mark(live)

    pre_mark = mark()
    builder(spark, os.path.join(path, "gen=%d" % gen), corpus)
    lease = _acquire_index_lease(path, owner=f"rebuild gen={gen}")
    try:
        if _index_root(path) != live:
            raise RuntimeError(
                f"index rebuild race: another rebuild published while this "
                f"one was training (live root moved off {live!r}); the "
                f"half-built gen={gen} was NOT published — re-run against "
                f"the current corpus"
            )
        post_mark = mark()
        if post_mark != pre_mark:
            detail = (
                f"{len(pre_mark)} -> {len(post_mark)} data files"
                if isinstance(pre_mark, frozenset)
                else f"{pre_mark} -> {post_mark}"
            )
            raise RuntimeError(
                f"index rebuild race: an append advanced the live "
                f"generation's append watermark ({detail}) after the "
                f"rebuild's corpus snapshot — its vectors would be missing "
                f"from gen={gen}, so the flip was REFUSED and the live "
                f"index is untouched; re-run the rebuild over a corpus "
                f"that includes the raced batch"
            )
        _publish_index_generation(path, gen)
    finally:
        _release_index_lease(lease)
    return gen


def _live_subspace_count(spark: SparkSession, path: str) -> int:
    """The live generation's trained subspace count, recovered from the
    persisted codebook shape — so a rebuild retrains at the SAME m the
    index was built with (a tuned m=32 index must not silently degrade
    to the default on its first drift-triggered rebuild)."""
    return len(_read_codebooks(spark, _index_root(path)))


def rebuild_ivfadc_index(
    spark: SparkSession, path: str, corpus: DataFrame
) -> int:
    """Retrain-and-swap for IVFADC: fresh coarse centroids, fresh
    residual codebooks (at the LIVE generation's subspace count), fresh
    cross-fit baselines, re-calibrated nprobe from the accumulated raw
    ``corpus``.  Returns the new generation."""
    m = _live_subspace_count(spark, path)
    return _rebuild_index(
        spark, path, corpus, lambda s, p, c: build_ivfadc_index(s, p, c, m=m)
    )


def rebuild_ivf_index(spark: SparkSession, path: str, corpus: DataFrame) -> int:
    """Retrain-and-swap for the raw-vector IVF index (same protocol;
    no batch-partitioned layout, so its append watermark is the
    corpus-dir data-file NAME SET — ``_ivf_append_mark`` — re-checked
    under the writer lease before the flip, exactly like the
    batch-counted families)."""
    return _rebuild_index(spark, path, corpus, build_ivf_index, codes_dir=None)


def rebuild_pq_index(spark: SparkSession, path: str, corpus: DataFrame) -> int:
    """Retrain-and-swap for the flat PQ index (same protocol, same
    live-m recovery as IVFADC)."""
    m = _live_subspace_count(spark, path)
    return _rebuild_index(
        spark, path, corpus, lambda s, p, c: build_pq_index(s, p, c, m=m)
    )


def maintain_ivf_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    corpus: DataFrame,
    drift_tol: float = 0.05,
) -> dict:
    """IVF twin of :func:`maintain_ivfadc_index`: append with the frozen
    quantizer; rebuild from the accumulated raw ``corpus`` (which must
    already include this batch) when the monitor fires."""
    report = dict(append_to_ivf_index(spark, path, batch, drift_tol))
    report["rebuilt"], report["generation"] = False, None
    if report["retrain"]:
        report["generation"] = rebuild_ivf_index(spark, path, corpus)
        report["rebuilt"] = True
    return report


def maintain_pq_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    corpus: DataFrame,
    drift_tol: float = 0.5,
    batch_id: int | None = None,
) -> dict:
    """PQ twin of :func:`maintain_ivfadc_index` (exactly-once append
    when ``batch_id`` is explicit; recon-ratio monitor — the family's
    0.5 ratio tolerance).  Flat PQ encodes RAW vectors, so this monitor
    is SCALE-sensitive: after a rebuild over a scale-mixed corpus,
    "healthy" means a batch from the same MIXTURE — a pure-large-scale
    batch reads a high recon ratio from its magnitude alone and fires,
    which is the correct reading (its quantization error genuinely is
    that much larger).  The normalized forms (IVF mean-cos, IVFADC
    residual recon over normalized vectors) don't have this axis."""
    report = dict(
        append_to_pq_index(spark, path, batch, drift_tol, batch_id)
    )
    report["rebuilt"], report["generation"] = False, None
    if report["retrain"]:
        report["generation"] = rebuild_pq_index(spark, path, corpus)
        report["rebuilt"] = True
    return report


def maintain_ivfadc_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    corpus: DataFrame,
    drift_tol: float = 0.05,
    batch_id: int | None = None,
) -> dict:
    """The full maintenance loop: absorb ``batch`` with frozen
    quantizers (exactly-once when ``batch_id`` is explicit), and when
    the coarse drift monitor fires, rebuild from ``corpus`` — the
    caller's accumulated raw vector store, which must already include
    this batch — and atomically swap generations.  Returns the append
    monitor report plus ``rebuilt`` / ``generation``."""
    report = dict(
        append_to_ivfadc_index(spark, path, batch, drift_tol, batch_id)
    )
    report["rebuilt"] = False
    report["generation"] = None
    if report["retrain"]:
        report["generation"] = rebuild_ivfadc_index(spark, path, corpus)
        report["rebuilt"] = True
    return report


def ivfadc_search_persisted(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = TOPK,
    nprobe: int | None = None,
    rerank_corpus: DataFrame | None = None,
    rerank_mult: int = 4,
) -> DataFrame:
    """Search the persisted IVFADC index: probe each query's nprobe
    cells (default: the index's calibrated ``recommended_nprobe``),
    build per-(query, cell) residual ADC tables in the Arrow stage, and
    scan ONLY the probed cells' code files — `cluster IN (...)` is a
    partition filter, so pruning happens at planning time, and the scan
    reads 4-byte codes, never a float vector.

    ``rerank_corpus`` (a (vec_id, e) frame — the raw vector store the
    index was built from; the index itself keeps only 4-byte codes)
    switches on the production IVFADC+R refinement: the ADC pass keeps a
    ``rerank_mult``·k shortlist per query, the shortlist's RAW vectors
    are fetched by id join (shortlist-sized, so AQE broadcasts it
    against the corpus scan), and exact cosine re-ranks to k — columns
    become (query_id, vec_id, cosine).  Measured (tools/recallbench.py,
    rerank_mult=4): recall@10 0.54 → 1.00 at 25x-clustered and
    0.25 → 0.51 at 25x-diffuse — in the diffuse regime the ADC
    shortlist itself is the bound, so raise ``rerank_mult`` (or nprobe)
    rather than expecting the re-rank alone to close it."""
    import os

    import numpy as np

    path = _index_root(path)
    crows = (
        spark.read.parquet(os.path.join(path, "centroids"))
        .orderBy("cluster")
        .collect()
    )
    C = np.asarray([r["centroid"] for r in crows], dtype=np.float64)
    cent = _centroid_df(spark, C)
    Cpq = _read_codebooks(spark, path)
    if nprobe is None:
        nprobe = int(
            spark.read.parquet(os.path.join(path, "stats")).collect()[0][
                "recommended_nprobe"
            ]
        )
    q_probes = _assign_clusters(_normalized_queries(queries), "qe", C, nprobe)
    q_resid = _residualize(q_probes, cent, "qe")
    dtable = _pq_adc_tables_keyed(q_resid, Cpq, ["query_id", "cluster"], "qe")
    probe_ids = sorted(
        r["cluster"] for r in q_probes.select("cluster").distinct().collect()
    )
    codes = spark.read.parquet(os.path.join(path, "codes")).filter(
        F.col("cluster").isin(probe_ids)
    )
    if rerank_corpus is None:
        return _ivfadc_scan(codes, dtable, k)
    from data_ingestion_backend_spark.operators.dedup import cosine_expr

    shortlist = _ivfadc_scan(codes, dtable, k * rerank_mult).select(
        "query_id", "vec_id"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        shortlist.join(rerank_corpus.select("vec_id", "e"), "vec_id")
        .join(
            queries.select(F.col("query_id"), F.col("qe")), "query_id"
        )
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_expr(F.col("e"), F.col("qe")), 6).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cosine")
        .orderBy("query_id", F.desc("cosine"), "vec_id")
    )


def _cv_residual_recon_baseline(
    spark: SparkSession, corpus: DataFrame, C, m: int = IVFADC_SUBSPACES
) -> float:
    """Cross-fit drift baseline — the `_cv_quantization_baseline` lesson
    applied to residual PQ: codebooks trained on one deterministic half
    of the corpus's residuals are evaluated on the other half, so the
    baseline is what an UNSEEN same-distribution batch actually scores.
    (The in-sample recon is optimistic by the train/holdout gap —
    measured ~0.27 phantom drift on the fixture — which a naive monitor
    would read as rot on every healthy batch.)"""
    cent = _centroid_df(spark, C)
    emb_n = _normalized_emb(corpus)
    half = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(2))
    fit_half = emb_n.filter(half == 0)
    eval_half = emb_n.filter(half == 1)
    r_fit = _residualize(
        _assign_clusters(fit_half, "e", C, 1), cent, "e"
    ).localCheckpoint(eager=True)
    Cpq_half, _ = pq_train(r_fit.select("vec_id", "e"), m=m)
    r_eval = _residualize(_assign_clusters(eval_half, "e", C, 1), cent, "e")
    return _pq_recon_error(
        spark,
        _pq_assign(
            spark,
            _subvector_table(r_eval.select("vec_id", "e"), m=len(Cpq_half)),
            Cpq_half,
        ),
        Cpq_half,
    )


@_with_index_lease
def append_to_ivfadc_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    drift_tol: float = 0.05,
    batch_id: int | None = None,
) -> dict:
    """Absorb a vector batch into the persisted IVFADC index with BOTH
    quantizers frozen: assign each vector its coarse cell, PQ-encode its
    residual, and land the codes in the batch's own
    ``cluster=/batch_id=`` partitions — exactly-once under re-delivery
    when ``batch_id`` is explicit (the ``append_to_pq_index`` protocol;
    auto-assigned ids are at-least-once).  The at-rest corpus is never
    re-read or re-encoded.

    Drift monitor — BOTH quantizer tiers, against CROSS-FIT baselines
    (the `_cv_quantization_baseline` lesson: in-sample baselines read
    the train/holdout gap as phantom drift on every healthy batch):

    - primary: the COARSE fit (batch mean cos to assigned centroid vs
      the build's cross-fit baseline, ``drift`` = absolute drop, the
      IVF monitor) — a distribution shift lands far from every
      centroid and this reads its full displacement.  Measured on the
      fixture: same-dist ≈ 0, planted shift ≈ 0.9 at tol 0.05.
    - secondary: the RESIDUAL reconstruction error ratio
      (``recon_drift``) — less sensitive (the coarse assignment absorbs
      the shift direction; measured same-dist 0.06 vs shifted 0.19) but
      it is the tier that degrades ADC accuracy directly, so both are
      reported.

    Returns ``{baseline_mean_cos, batch_mean_cos, drift,
    baseline_recon, batch_recon, recon_drift, retrain}``; the batch is
    absorbed either way — the monitor signals, it does not gate."""
    import os

    import numpy as np

    path = _index_root(path)
    crows = (
        spark.read.parquet(os.path.join(path, "centroids"))
        .orderBy("cluster")
        .collect()
    )
    C = np.asarray([r["centroid"] for r in crows], dtype=np.float64)
    Cpq = _read_codebooks(spark, path)
    cent = _centroid_df(spark, C)
    assigned = _assign_clusters(_normalized_emb(batch), "e", C, 1)
    batch_cos = float(
        _quantization_fit(
            assigned.select("cluster", F.col("e")), cent
        ).collect()[0]["mean_cos"]
    )
    resid = _residualize(assigned, cent, "e").localCheckpoint(eager=True)
    subs_assigned = _pq_assign(
        spark, _subvector_table(resid.select("vec_id", "e"), m=len(Cpq)), Cpq
    ).localCheckpoint(eager=True)
    batch_recon = _pq_recon_error(spark, subs_assigned, Cpq)
    stats = spark.read.parquet(os.path.join(path, "stats")).collect()[0]
    baseline = float(stats["baseline_recon"])
    baseline_cos = float(stats["baseline_mean_cos"])
    codes_path = os.path.join(path, "codes")
    if batch_id is None:
        batch_id = _next_batch_id(spark, codes_path)
    (
        subs_assigned.select("vec_id", "sub", "code")
        .join(resid.select("vec_id", "cluster"), "vec_id")
        .withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cluster", "batch_id")
        .parquet(codes_path)
    )
    drift = baseline_cos - batch_cos
    recon_drift = (
        (batch_recon - baseline) / baseline if baseline > 0 else 0.0
    )
    return {
        "baseline_mean_cos": baseline_cos,
        "batch_mean_cos": batch_cos,
        "drift": drift,
        "baseline_recon": baseline,
        "batch_recon": batch_recon,
        "recon_drift": recon_drift,
        "retrain": drift > drift_tol,
    }


#: per-process persisted-index memo for the *_search bench forms:
#: (sf_dir, family) → index path.  The bench's untimed warm-up run pays
#: the one-off build; every timed run measures SEARCH ONLY — the cost a
#: production user pays per query batch (training amortizes into the
#: nightly build).  The train+search forms (sim_pq_topk /
#: sim_ivfadc_topk) stay in the bench unchanged so the artifact carries
#: BOTH numbers.
_BENCH_INDEX_MEMO: dict = {}


def _bench_index_path(spark: SparkSession, sf_dir: str, family: str, builder) -> str:
    import os
    import tempfile

    key = (os.path.abspath(sf_dir), family)
    path = _BENCH_INDEX_MEMO.get(key)
    if path is None or not os.path.isdir(path):
        path = tempfile.mkdtemp(prefix=f"benchidx_{family}_")
        builder(spark, path, _emb(spark, sf_dir).select("vec_id", "e"))
        _BENCH_INDEX_MEMO[key] = path
    return path


@_register_standalone("sim_pq_search", None)  # rows-only by design:
# the search-only half of sim_pq_topk over a memoized persisted index —
# the per-query cost a user actually pays; correctness rides the same
# numpy differentials + persisted goldens as the train+search form
def sim_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-PQ ADC search for the fixture probe set (index built
    once per process by the bench warm-up, then frozen)."""
    path = _bench_index_path(spark, sf_dir, "pq", build_pq_index)
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    return pq_search_persisted(spark, path, queries)


@_register_standalone("sim_ivfadc_search", None)  # rows-only by design:
# search-only IVFADC over the memoized persisted index (calibrated
# nprobe) — same split rationale as sim_pq_search
def sim_ivfadc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-IVFADC search for the fixture probe set: probed-cell
    partition pruning + residual ADC, no training in the timed path."""
    path = _bench_index_path(spark, sf_dir, "ivfadc", build_ivfadc_index)
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < PQ_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    return ivfadc_search_persisted(spark, path, queries)


@_register_standalone("sim_ivfadc_topk", None)  # rows-only by design:
# two nested Lloyd trainings (coarse + residual PQ) are iterative, not
# one SQL query; the cert is the numpy end-to-end differential +
# persisted≡in-memory + pruning plan pin + recall floor in
# tests/test_ivfadc.py
def sim_ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC top-{TOPK} for the fixture probe set — the composed
    production ANN form (coarse cells + residual PQ codes)."""
    emb = _emb(spark, sf_dir).select("vec_id", "e")
    queries = (
        emb.filter(F.col("vec_id") < PQ_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
    )
    return ivfadc_topk(emb, queries)
