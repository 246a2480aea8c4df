"""Lexical retrieval: BM25 top-k keyword search over the document corpus.

The missing leg of the retrieval story: the engine already has embedding
ANN (``similarity.py``) and near-dup candidate generation (``dedup.py``);
this module adds the sparse/lexical ranking an LLM-data pipeline needs
for benchmark decontamination probes, targeted corpus slicing ("find the
docs about X"), and hybrid (lexical + dense) retrieval.

Reference parity note: the reference (rpdevelops/data-ingestion-backend)
has no search surface — its closest shape is the filtered listing
endpoints (`src/app/repository/contact_repository.py:34-40`).  BM25 here
is an extension operator per the north star (BASELINE.json: "text
analysis" / retrieval), built only from public BM25 literature
(Robertson & Zaragoza 2009) and public PySpark APIs.

Scale design (100 TB):

- **Inverted-index join, never corpus scoring.**  Candidates are the
  postings rows whose term appears in a query — the query-term table is
  tiny and broadcast, so candidate generation is a map-side hash join on
  the postings table.  Docs sharing no term with any query are never
  scored, never shuffled.
- **Exact df without a second corpus pass**: document frequency is only
  needed for query terms, so it is computed on the term-filtered postings
  (one small aggregation), not the whole index.
- **One scored shuffle**: contributions aggregate by (query_id, doc_id);
  top-k is a per-query window over the scored candidates (bounded by
  |postings of query terms|, not the corpus).
- **Deterministic cross-engine scores**: every input to the float math
  (tf, df, dl, n_docs, avgdl) is exactly representable and identical on
  both engines; the per-term contribution is snapped to a 1e-4 grid and
  summed as BIGINT (exact, associative — partial-aggregation order cannot
  flip the hash), and ranking orders by that integer score with a doc_id
  tiebreak.  Same discipline as ``mlprep.prep_idf_rarity``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_ingestion_backend_spark.operators.queries import _register_standalone
from data_ingestion_backend_spark.sources.fixtures import load_table

# Classic BM25 constants (Robertson & Zaragoza 2009 defaults).
BM25_K1 = 1.2
BM25_B = 0.75
TOPK = 10
# Fixture query set: the first QUERY_PREFIX_TOKENS tokens of each probe
# doc form its query (dedup'd) — deterministic, engine-agnostic, and the
# probe doc itself is a planted relevant result.
QUERY_PREFIX_TOKENS = 6
_QUERY_PRED_SQL = "doc_id % 100 = 3 AND doc_id < 500"


def bm25_postings(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Build the inverted index: ``(doc_id, dl, term, tf)`` postings plus
    the 1-row corpus stats ``(n_docs, avgdl)``.

    dl rides along from the tokenize stage so scoring never joins back to
    the corpus for document lengths (at 100 TB that join would shuffle
    the whole doc table; here it is a groupBy key that is functionally
    dependent on doc_id and therefore free).
    """
    base = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    postings = (
        base.select(
            "doc_id",
            F.size("toks").alias("dl"),
            F.explode("toks").alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    stats = base.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.sum(F.size("toks")).cast("double") / F.count("*")).alias("avgdl"),
    )
    return postings, stats


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Rank the top-``k`` docs per query by BM25.

    ``queries``: (query_id, term) — distinct terms per query, small enough
    to broadcast (a query is a handful of terms even when the query SET
    has millions of rows, the per-term fan-out is what matters and it is
    bounded by the postings of those terms).

    score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).  Each term's
    contribution is snapped to a 1e-4 grid and summed exactly as BIGINT
    so the score (and thus the ranking) is engine- and order-independent.

    ``max_df_frac``: the hot-term defense.  A query containing a
    ubiquitous term (a stopword, a boilerplate token) makes the
    candidate set THE WHOLE CORPUS — at 100 TB that one term turns the
    broadcast-join pruning into a full scan-and-shuffle.  Setting e.g.
    ``max_df_frac=0.1`` drops query terms whose df exceeds 10% of the
    corpus from CANDIDATE GENERATION (their idf ≈ ln(1 + ~1/frac⁻¹) is
    the smallest of any query term, so the score perturbation is the
    smallest possible for any term you could drop); rare terms still
    retrieve, and a query of ONLY ubiquitous terms degrades to empty
    rather than to a corpus scan.  None (the certified default) keeps
    exact BM25.  This is the same df-pruning idea as the n-gram dedup
    inverted index (`dedup.NGRAM_MAX_DF`), applied to retrieval.
    """
    postings, _ = bm25_postings(docs)
    return bm25_topk_from_index(
        postings,
        _stats_from_postings(postings),
        queries,
        k=k,
        k1=k1,
        b=b,
        max_df_frac=max_df_frac,
    )


def _stats_from_postings(postings: DataFrame) -> DataFrame:
    """(n_docs, avgdl) derived from the postings table instead of a
    second corpus scan (r14, guide §2.4): ``bm25_postings``' stats arm
    re-scanned and re-tokenized every document — a stage with no shared
    exchange, so runtime exchange reuse could never collapse it — while
    this form aggregates the distinct (doc_id, dl) pairs of the SAME
    postings subtree, whose exchange the scoring join already pays for.

    Bit-equal to the base-scan stats whenever every document tokenizes
    to ≥ 1 posting row (text non-null — ``split`` never returns an
    empty array, and the fixtures carry no NULL/empty text at any SF):
    dl is constant per doc_id, so Σ over distinct (doc_id, dl) IS
    Σ size(toks), n_docs is the distinct doc count, and the terminal
    CAST(Σdl AS DOUBLE) / n_docs is the identical double division."""
    per_doc = postings.select("doc_id", "dl").distinct()
    return per_doc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )


def bm25_topk_from_index(
    postings: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    k: int = TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Score from a PREBUILT index — the body of :func:`bm25_topk`, split
    out so the persisted/incrementally-maintained index (``search_index``
    module functions below) shares the exact scoring arithmetic with the
    certified build-per-query form.  ``stats`` must carry
    ``(n_docs, avgdl)``."""
    qterms = queries.select("query_id", "term").distinct()
    # exact df for query terms only: postings are distinct (doc, term)
    # pairs, so count(*) per term IS document frequency.
    df_tbl = (
        postings.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"))
    )
    if max_df_frac is not None:
        df_tbl = df_tbl.crossJoin(F.broadcast(stats.select("n_docs"))).filter(
            F.col("df") <= max_df_frac * F.col("n_docs")
        ).drop("n_docs")
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tfn = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * ((1.0 - b) + b * F.col("dl") / F.col("avgdl"))
    )
    # FLOOR-grid snap, not ROUND: idf·tfn flows through ln/÷ so the
    # double is irrational-class — a near-midpoint contribution can
    # ROUND differently per engine (Spark HALF_UP on the exact binary
    # expansion vs DuckDB in float) and flip a rank at a new SF.  FLOOR
    # of the identical double is exact on both engines (same idiom as
    # the timeseries z-score grid); contributions are positive, so no
    # toward-zero asymmetry.
    contrib = F.floor(idf * tfn * 10000.0).cast("bigint")
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(contrib).alias("score_i"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_i"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "rank",
            F.round(F.col("score_i") / 10000.0, 4).alias("score"),
        )
    )


# Shared CTE block: inverted index → integer-grid BM25 scores → per-query
# ranking.  Used verbatim by BOTH the BM25 oracle and the hybrid-fusion
# oracle so the two can never drift.
_BM25_CORE_CTES = f"""base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
postings AS (
  SELECT doc_id, dl, term, COUNT(*) AS tf
  FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM base)
  GROUP BY doc_id, dl, term
),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(len(toks)) AS DOUBLE) / COUNT(*) AS avgdl
  FROM base
),
qterms AS (
  SELECT DISTINCT doc_id AS query_id, term
  FROM (SELECT doc_id,
               unnest((string_split(text, ' '))[1:{QUERY_PREFIX_TOKENS}]) AS term
        FROM documents WHERE {_QUERY_PRED_SQL})
),
dfreq AS (
  SELECT p.term, COUNT(*) AS df
  FROM postings p
  WHERE p.term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY p.term
),
lscored AS (
  SELECT q.query_id, p.doc_id,
         SUM(CAST(FLOOR(
           ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (p.tf * {BM25_K1 + 1.0})
             / (p.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * p.dl / s.avgdl))
           * 10000.0) AS BIGINT)) AS score_i
  FROM qterms q
  JOIN postings p ON p.term = q.term
  JOIN dfreq d ON d.term = q.term
  CROSS JOIN stats s
  GROUP BY q.query_id, p.doc_id
),
lexr AS (
  SELECT query_id, doc_id, score_i,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score_i DESC, doc_id) AS rnk
  FROM lscored
)"""

_BM25_ORACLE = f"""
WITH {_BM25_CORE_CTES}
SELECT query_id, doc_id, rnk AS rank, ROUND(score_i / 10000.0, 4) AS score
FROM lexr
WHERE rnk <= {TOPK}
ORDER BY query_id, rank
"""


@_register_standalone("search_bm25_topk", _BM25_ORACLE)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-certified BM25 sweep: each probe doc's leading
    tokens form a query; the full inverted-index → broadcast-join →
    exact-integer-score → per-query top-k pipeline runs on both engines
    (DuckDB recomputes the identical grid-snapped scores, so ranking —
    including tie-breaks and collision cases — matches bit-for-bit)."""
    docs = load_table(spark, sf_dir, "documents")
    probes = docs.filter((F.col("doc_id") % 100 == 3) & (F.col("doc_id") < 500))
    queries = probes.select(
        F.col("doc_id").alias("query_id"),
        F.explode(
            F.slice(F.split(F.col("text"), " "), 1, QUERY_PREFIX_TOKENS)
        ).alias("term"),
    ).distinct()
    return bm25_topk(docs, queries).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# Hybrid retrieval: Reciprocal Rank Fusion of the lexical and dense arms
# --------------------------------------------------------------------------

#: RRF smoothing constant (Cormack, Clarke & Büttcher 2009's k=60)
RRF_K = 60
#: integer grid for 1/(k+rank) so fused scores sum exactly as BIGINT
RRF_SCALE = 1_000_000.0

_HYBRID_ORACLE = f"""
WITH {_BM25_CORE_CTES},
qv AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
  FROM embeddings WHERE vec_id % 100 = 3 AND vec_id < 500
),
dscored AS (
  SELECT q.query_id, e.vec_id AS doc_id,
         round(list_cosine_similarity(
           list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qe), 6)
           AS cosine
  FROM embeddings e, qv q
),
denr AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, doc_id) AS rnk
  FROM dscored
),
fused AS (
  SELECT query_id, doc_id,
         SUM(CAST(FLOOR({RRF_SCALE} / ({RRF_K} + rnk)) AS BIGINT)) AS rrf_i
  FROM (
    SELECT query_id, doc_id, rnk FROM lexr WHERE rnk <= {TOPK}
    UNION ALL
    SELECT query_id, doc_id, rnk FROM denr WHERE rnk <= {TOPK}
  )
  GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, rank, ROUND(rrf_i / {RRF_SCALE}, 6) AS rrf
FROM (
  SELECT query_id, doc_id, rrf_i,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rrf_i DESC, doc_id) AS rank
  FROM fused
)
WHERE rank <= {TOPK}
ORDER BY query_id, rank
"""


def rrf_fuse(ranked_arms: list[DataFrame], k: int = RRF_K, topk: int = TOPK) -> DataFrame:
    """Reciprocal Rank Fusion over any number of (query_id, doc_id, rnk)
    ranked lists: score(q,d) = Σ_arms 1/(k + rank_arm(q,d)), computed on
    the 1e6-point integer grid (``RRF_SCALE``) so partial-aggregation order
    cannot flip ties.  Input arms are already top-k-bounded, so the union
    is |queries|·k·|arms| rows — trivially small next to the corpus no
    matter the scale; the fusion shuffle is negligible by construction.
    """
    unioned = ranked_arms[0].select("query_id", "doc_id", "rnk")
    for arm in ranked_arms[1:]:
        unioned = unioned.unionByName(arm.select("query_id", "doc_id", "rnk"))
    # FLOOR-grid for the same cross-engine reason as the BM25 contribs:
    # RRF_SCALE/(k+rank) is a computed double; floor of the identical
    # double is exact where a near-midpoint ROUND may differ per engine.
    contrib = F.floor(F.lit(RRF_SCALE) / (F.lit(k) + F.col("rnk"))).cast("bigint")
    fused = unioned.groupBy("query_id", "doc_id").agg(
        F.sum(contrib).alias("rrf_i")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_i"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "doc_id",
            "rank",
            F.round(F.col("rrf_i") / RRF_SCALE, 6).alias("rrf"),
        )
    )


def _dense_candidates_arrow(
    emb: DataFrame, q_rows: list, topk: int = TOPK, margin: float = 1e-5
) -> DataFrame:
    """Per-batch-pruned cosine candidates for a tiny query set: one
    ``mapInPandas`` stage over (vec_id, e) emitting (query_id, doc_id,
    cos) for every row that could still reach a query's global rounded
    top-``topk`` (guide §4.2 — replaces |emb|·|q| interpreted 64-element
    Catalyst folds with vectorized numpy, and prunes the window input
    from |emb|·|q| rows to ~topk per (batch, query)).

    Bit-faithfulness: the kernel reproduces ``dedup.cosine_expr``'s
    exact IEEE operation sequence — dot and squared-norm accumulate
    LEFT-TO-RIGHT over the dimension axis (one rounded multiply + one
    rounded add per element, exactly the Catalyst ``aggregate`` fold),
    then ``dot / (norm_a * norm_b)`` in that association — so the
    emitted double is bit-identical to the expression it replaces, and
    the terminal ``round(cos, 6)`` still runs in Catalyst on that
    identical double.

    Pruning exactness: downstream ranks by (round(cos, 6) DESC, doc_id).
    HALF_UP decimal rounding at 6 digits is monotone with
    |round(x) − x| ≤ 5e-7, so a row more than ``margin`` = 1e-5 below a
    batch's k-th largest UNROUNDED cosine rounds strictly below the
    rounded values of ≥ k retained rows and can never enter the global
    top-k under any tie-break.  Non-finite cosines (zero-norm vectors)
    are always retained — their ordering is left entirely to Catalyst.
    """
    import numpy as np

    qs = sorted(q_rows, key=lambda r: r[0])
    q_ids = np.asarray([r[0] for r in qs], dtype=np.int64)
    Q = np.asarray([r[1] for r in qs], dtype=np.float64)  # nq × d
    d = Q.shape[1]
    qn = np.zeros(len(qs), dtype=np.float64)
    for j in range(d):  # left-to-right fold, same as cosine_expr's norm
        qn += Q[:, j] * Q[:, j]
    qn = np.sqrt(qn)

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            M = np.asarray(pdf["e"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            nsq = np.zeros(n, dtype=np.float64)
            for j in range(d):
                nsq += M[:, j] * M[:, j]
            nrm = np.sqrt(nsq)
            out_q, out_d, out_c = [], [], []
            for qi in range(len(q_ids)):
                acc = np.zeros(n, dtype=np.float64)
                q = Q[qi]
                for j in range(d):
                    acc += M[:, j] * q[j]
                cos = acc / (nrm * qn[qi])
                finite = np.isfinite(cos)
                if int(finite.sum()) > topk:
                    kth = np.partition(cos[finite], -topk)[-topk]
                    keep = (~finite) | (cos >= kth - margin)
                else:
                    keep = np.ones(n, dtype=bool)
                out_q.append(np.full(int(keep.sum()), q_ids[qi], dtype=np.int64))
                out_d.append(ids[keep])
                out_c.append(cos[keep])
            import pandas as pd

            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "doc_id": np.concatenate(out_d),
                    "cos": np.concatenate(out_c),
                }
            )

    return emb.select("vec_id", "e").mapInPandas(
        gen, "query_id bigint, doc_id bigint, cos double"
    )


def dense_topk_catalyst(emb: DataFrame, qv: DataFrame, topk: int = TOPK) -> DataFrame:
    """The pre-r14 dense arm (crossJoin × interpreted cosine fold ×
    full-corpus window) — kept as the independent twin for the
    differential test pinning the Arrow candidate kernel bit-equal."""
    from data_ingestion_backend_spark.operators.dedup import cosine_expr

    dscored = emb.crossJoin(F.broadcast(qv)).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.round(cosine_expr(F.col("e"), F.col("qe")), 6).alias("cosine"),
    )
    wd = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("doc_id"))
    return (
        dscored.withColumn("rnk", F.row_number().over(wd).cast("bigint"))
        .filter(F.col("rnk") <= topk)
        .select("query_id", "doc_id", "rnk")
    )


@_register_standalone("search_hybrid_rrf", _HYBRID_ORACLE)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval certified end-to-end: the lexical arm is the BM25
    pipeline above, the dense arm is broadcast-probe cosine kNN over the
    embeddings table (same probe ids — doc and vector ids share an id
    space in the fixtures), and the fused ranking is exact-integer RRF.
    DuckDB recomputes all three stages, so arm ranks AND fused tie-breaks
    match bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    probes = docs.filter((F.col("doc_id") % 100 == 3) & (F.col("doc_id") < 500))
    queries = probes.select(
        F.col("doc_id").alias("query_id"),
        F.explode(
            F.slice(F.split(F.col("text"), " "), 1, QUERY_PREFIX_TOKENS)
        ).alias("term"),
    ).distinct()
    lex = bm25_topk(docs, queries).select(
        "query_id", "doc_id", F.col("rank").alias("rnk")
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    # dense arm (r14, guide §4.2): the probe set is a handful of vectors
    # (model-sized collect — the same boundary the Lloyd/PQ kernels use),
    # so the |emb|·|q| interpreted cosine folds + full-corpus window
    # collapse into one Arrow stage emitting ~topk candidates per
    # (batch, query); round + rank stay in Catalyst on the identical
    # doubles (see _dense_candidates_arrow for the exactness argument).
    q_rows = [
        (r["query_id"], r["qe"])
        for r in emb.filter(
            (F.col("vec_id") % 100 == 3) & (F.col("vec_id") < 500)
        )
        .select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
        .collect()
    ]
    cand = _dense_candidates_arrow(emb, q_rows, topk=TOPK)
    dscored = cand.select(
        "query_id", "doc_id", F.round(F.col("cos"), 6).alias("cosine")
    )
    wd = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("doc_id"))
    den = (
        dscored.withColumn("rnk", F.row_number().over(wd).cast("bigint"))
        .filter(F.col("rnk") <= TOPK)
        .select("query_id", "doc_id", "rnk")
    )
    return rrf_fuse([lex, den]).orderBy("query_id", "rank")


# --------------------------------------------------------------------------
# Persisted + incrementally-maintained BM25 index
# --------------------------------------------------------------------------
#
# The retrieval twin of `dedup_incremental` and `similarity.
# append_to_ivf_index`: at 100 TB the inverted index is MAINTAINED, not
# rebuilt per query — new documents tokenize once, their postings append
# into the persisted table, and the global stats (n_docs, Σdl) merge as
# exact integers.  Query-time scoring derives idf/avgdl from the CURRENT
# stats, so every document's score automatically reflects the grown
# corpus — the index stores corpus-independent facts (tf, dl) only,
# which is precisely why BM25 supports cheap appends where a score-
# materializing index would need a full rescore per batch.
#
# At rest the postings table is written bucketed/partitioned by term
# hash so a query's broadcast-term probe prunes buckets; the local
# warehouse models the append discipline (versioned snapshot union),
# Delta/Iceberg file appends drop the rewrite cost.

SEARCH_POSTINGS_TABLE = "search_postings"
SEARCH_STATS_TABLE = "search_stats"


def _postings_and_int_stats(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    base = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    postings = (
        base.select(
            "doc_id",
            F.size("toks").alias("dl"),
            F.explode("toks").alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    stats_int = base.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size("toks")).cast("bigint").alias("sum_dl"),
    )
    return postings, stats_int


def build_search_index(wh, docs: DataFrame) -> None:
    """Materialize the inverted index: postings + INTEGER corpus stats
    (n_docs, Σdl — exact, so incremental merges can never drift from a
    rebuild the way running float averages would)."""
    postings, stats_int = _postings_and_int_stats(docs)
    wh.publish({
        SEARCH_POSTINGS_TABLE: wh.stage(SEARCH_POSTINGS_TABLE, postings),
        SEARCH_STATS_TABLE: wh.stage(SEARCH_STATS_TABLE, stats_int),
    })


def append_to_search_index(wh, new_docs: DataFrame, batch_id: int | None = None) -> None:
    """Absorb a document batch: tokenize the BATCH only, append its
    postings, add its integer stats.  The corpus is never re-tokenized —
    per-batch cost is O(|batch| tokens) + the snapshot append.

    An index never built reads as EMPTY (models.SCHEMAS registers the
    search tables), so the first append IS the build.

    ``batch_id`` opts into the exactly-once commit protocol shared with
    the streaming sinks (``streaming/txn.py``): a re-delivered batch id
    is rejected outright, and a crash between the two table writes (or
    after them but before the marker) makes the re-run rebuild from the
    intent-pinned base versions instead of stacking onto its own partial
    commit.  Without it the append is a plain read-modify-write — fine
    for a single-writer batch job, unsafe under re-delivery."""
    from data_ingestion_backend_spark.streaming import txn

    postings_base = wh.current_version(SEARCH_POSTINGS_TABLE)
    stats_base = wh.current_version(SEARCH_STATS_TABLE)
    if batch_id is not None:
        if batch_id <= txn.last_batch(wh, SEARCH_POSTINGS_TABLE):
            return
        bases = txn.begin_batch(
            wh,
            SEARCH_POSTINGS_TABLE,
            batch_id,
            {"postings": postings_base, "stats": stats_base},
            tables={
                "postings": SEARCH_POSTINGS_TABLE,
                "stats": SEARCH_STATS_TABLE,
            },
        )
        postings_base, stats_base = bases["postings"], bases["stats"]
    new_postings, new_stats = _postings_and_int_stats(new_docs)
    merged = (
        wh.read(SEARCH_STATS_TABLE, stats_base)
        .unionByName(new_stats)
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("sum_dl").cast("bigint").alias("sum_dl"),
        )
    )
    # stage both, publish once: a reader (bm25_topk_persisted) can never
    # see postings that include the batch while n_docs/sum_dl exclude it
    # (or vice versa) — idf/avgdl always derive from the same corpus
    wh.publish({
        SEARCH_POSTINGS_TABLE: wh.stage(
            SEARCH_POSTINGS_TABLE,
            wh.read(SEARCH_POSTINGS_TABLE, postings_base).unionByName(new_postings),
        ),
        SEARCH_STATS_TABLE: wh.stage(SEARCH_STATS_TABLE, merged),
    })
    if batch_id is not None:
        txn.commit_batch(wh, SEARCH_POSTINGS_TABLE, batch_id)


def bm25_topk_persisted(
    wh,
    queries: DataFrame,
    k: int = TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Search the persisted index.  avgdl derives from the integer stats
    with the same double division the per-query build uses
    (CAST(Σdl) / n_docs), so persisted-vs-rebuilt rankings are
    bit-identical — golden-tested in tests/test_search.py."""
    postings = wh.read(SEARCH_POSTINGS_TABLE)
    stats = wh.read(SEARCH_STATS_TABLE).select(
        "n_docs",
        (F.col("sum_dl").cast("double") / F.col("n_docs")).alias("avgdl"),
    )
    return bm25_topk_from_index(
        postings, stats, queries, k=k, k1=k1, b=b, max_df_frac=max_df_frac
    )


# --------------------------------------------------------------------------
# Hard-negative mining for retrieval training (DPR-style)
# --------------------------------------------------------------------------
#
# Training a dense retriever needs, per query, the top-ranked documents a
# LEXICAL retriever surfaces that are NOT the relevant document — "hard
# negatives" (Karpukhin et al., "Dense Passage Retrieval", EMNLP 2020
# mines them from BM25).  The fixture's relevance labels are built in:
# each probe query is derived from its document's leading tokens, so
# doc_id == query_id IS the positive.  The miner therefore runs the
# certified BM25 pipeline, drops the positive, and re-ranks — sharing
# _BM25_CORE_CTES verbatim with the BM25/hybrid oracles so the three can
# never drift.

N_HARD_NEGATIVES = 5

_HARD_NEG_ORACLE = f"""
WITH {_BM25_CORE_CTES}
SELECT query_id, doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score_i DESC, doc_id) AS BIGINT)
         AS neg_rank,
       ROUND(score_i / 10000.0, 4) AS score
FROM lexr
WHERE rnk <= {N_HARD_NEGATIVES + 1} AND doc_id <> query_id
QUALIFY neg_rank <= {N_HARD_NEGATIVES}
ORDER BY query_id, neg_rank
"""


def bm25_hard_negatives(
    docs: DataFrame, queries: DataFrame, n_neg: int = N_HARD_NEGATIVES
) -> DataFrame:
    """(query_id, doc_id, neg_rank, score): per query, the ``n_neg``
    highest-BM25 documents excluding the positive (doc_id == query_id).

    Correct under exclusion-then-rerank: the top n_neg+1 overall always
    contain the true top-n_neg negatives whether or not the positive is
    among them, so one certified BM25 pass at k = n_neg+1 suffices — no
    second scoring join, no corpus rescan.
    """
    ranked = bm25_topk(docs, queries, k=n_neg + 1)
    w = Window.partitionBy("query_id").orderBy(F.asc("rank"))
    return (
        ranked.filter(F.col("doc_id") != F.col("query_id"))
        .withColumn("neg_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("neg_rank") <= n_neg)
        .select("query_id", "doc_id", "neg_rank", "score")
        .orderBy("query_id", "neg_rank")
    )


@_register_standalone("search_hard_negatives", _HARD_NEG_ORACLE)
def search_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 hard negatives for the fixture probe queries."""
    docs = load_table(spark, sf_dir, "documents")
    probes = docs.filter((F.col("doc_id") % 100 == 3) & (F.col("doc_id") < 500))
    queries = probes.select(
        F.col("doc_id").alias("query_id"),
        F.explode(
            F.slice(F.split(F.col("text"), " "), 1, QUERY_PREFIX_TOKENS)
        ).alias("term"),
    ).distinct()
    return bm25_hard_negatives(docs, queries)


# --------------------------------------------------------------------------
# Per-document keyword extraction (TF-IDF top-k)
# --------------------------------------------------------------------------
#
# The tagging/routing primitive (salient terms per document — corpus
# labeling, index-time keyword fields, cluster naming).  Classic TF-IDF
# with the family's exact-integer discipline: tf and df are exact
# counts, idf = ln(N/df) snapped to the same 1e-4 FLOOR grid BM25 uses
# (identical doubles on both engines; floor is exact on them), and the
# per-term score is the BIGINT product tf · idf_i — so ranking and
# tie-breaks certify bit-for-bit.

KEYWORDS_PER_DOC = 3


def tfidf_keywords(docs: DataFrame, k: int = KEYWORDS_PER_DOC) -> DataFrame:
    """(doc_id, term, rnk, score_i): each document's top-``k`` terms by
    exact-integer TF-IDF.

    Plan shape: one tokenize+groupBy builds the postings (map-side
    combined), df aggregates the SAME postings (distinct (doc, term)
    rows → count per term is df), N rides as a broadcast 1-row
    aggregate, and the top-k window partitions by doc_id — uniform keys,
    no hot partition.  The df join's skew (stopwords) is
    AQE-splittable.
    """
    # n_docs derives from the postings subtree (r14 — see
    # _stats_from_postings), not a second corpus scan+tokenize
    postings, _ = bm25_postings(docs)
    stats = _stats_from_postings(postings)
    df_tbl = postings.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    idf_i = F.floor(
        F.log(F.col("n_docs").cast("double") / F.col("df")) * 10000.0
    ).cast("bigint")
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_i"), F.asc("term")
    )
    return (
        postings.join(df_tbl, "term")
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * idf_i).alias("score_i"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "rnk", "score_i")
        .orderBy("doc_id", "rnk")
    )


_KEYWORDS_ORACLE = f"""
WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
postings AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM base)
  GROUP BY doc_id, term
),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM base),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM postings GROUP BY term),
scored AS (
  SELECT p.doc_id, p.term,
         p.tf * CAST(FLOOR(ln(CAST(s.n_docs AS DOUBLE) / d.df) * 10000.0)
                     AS BIGINT) AS score_i
  FROM postings p JOIN dfreq d ON d.term = p.term CROSS JOIN stats s
)
SELECT doc_id, term,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score_i DESC, term) AS BIGINT) AS rnk,
       score_i
FROM scored
QUALIFY rnk <= {KEYWORDS_PER_DOC}
ORDER BY doc_id, rnk"""


@_register_standalone("text_tfidf_keywords", _KEYWORDS_ORACLE)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{KEYWORDS_PER_DOC} TF-IDF keywords per fixture document."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return tfidf_keywords(docs)


# --- retrieval evaluation: nDCG@k / MRR, integer-exact -----------------------
#
# Closes the retrieval loop: the engine that RANKS (BM25/RRF above) also
# MEASURES ranking quality.  Graded relevance is derived deterministically
# from the fixture (rel(q, d) = |query's distinct prefix terms present in
# d|, capped at 3 — the standard term-overlap pseudo-judgment), the query
# doc itself is excluded from both the ranking and the ideal, and every
# metric is PURE BIGINT:
#
# - position discounts are the MILLI-UNIT table round(1000/log2(i+1))
#   injected as identical integer literals into both engines (no libm
#   call at eval time — the same quantization discipline as the
#   whole-bit LM surprisal),
# - DCG@k  = Σ rel_i · D_i            (BIGINT),
# - IDCG@k = the same sum over the corpus-wide ideal ordering,
# - nDCG   = (10^6 · DCG) div IDCG    (ppm, 0 when no relevant doc),
# - MRR    = 1000 div first-relevant-position (milli, 0 when none).

#: milli-unit position discounts for ranks 1..TOPK
NDCG_DISCOUNTS = [1000, 631, 500, 431, 387, 356, 333, 315, 301, 289]

_D_CASE_POS = "CASE pos " + " ".join(
    f"WHEN {i + 1} THEN {d}" for i, d in enumerate(NDCG_DISCOUNTS)
) + " ELSE 0 END"

_EVAL_ORACLE = f"""
WITH {{core}},
ranked AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rnk) AS pos
  FROM lexr WHERE rnk <= {TOPK} + 1 AND doc_id <> query_id
),
rel AS (
  SELECT q.query_id, p.doc_id,
         LEAST(COUNT(DISTINCT q.term), 3) AS rel
  FROM qterms q JOIN postings p ON p.term = q.term
  WHERE p.doc_id <> q.query_id
  GROUP BY q.query_id, p.doc_id
),
dcg AS (
  SELECT r.query_id,
         SUM(COALESCE(l.rel, 0) * ({_D_CASE_POS})) AS dcg_milli
  FROM ranked r LEFT JOIN rel l USING (query_id, doc_id)
  WHERE r.pos <= {TOPK}
  GROUP BY r.query_id
),
ideal AS (
  SELECT query_id, rel,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rel DESC, doc_id) AS pos
  FROM rel
),
idcg AS (
  SELECT query_id, SUM(rel * ({_D_CASE_POS})) AS idcg_milli
  FROM ideal WHERE pos <= {TOPK} GROUP BY query_id
),
firstrel AS (
  SELECT r.query_id, MIN(r.pos) AS fp
  FROM ranked r JOIN rel l USING (query_id, doc_id)
  WHERE r.pos <= {TOPK} AND l.rel >= 1
  GROUP BY r.query_id
)
SELECT d.query_id,
       CAST(d.dcg_milli AS BIGINT) AS dcg_milli,
       CAST(COALESCE(i.idcg_milli, 0) AS BIGINT) AS idcg_milli,
       CAST(CASE WHEN COALESCE(i.idcg_milli, 0) = 0 THEN 0
            ELSE (1000000 * d.dcg_milli) // i.idcg_milli END AS BIGINT)
         AS ndcg_ppm,
       CAST(COALESCE(1000 // f.fp, 0) AS BIGINT) AS mrr_milli
FROM dcg d
LEFT JOIN idcg i USING (query_id)
LEFT JOIN firstrel f USING (query_id)
ORDER BY d.query_id"""


def eval_ndcg(
    docs: DataFrame, queries: DataFrame, ranked: DataFrame, k: int = TOPK
) -> DataFrame:
    """(query_id, dcg_milli, idcg_milli, ndcg_ppm, mrr_milli) for a
    ranked result list against term-overlap graded relevance.

    ``queries``: (query_id, term); ``ranked``: (query_id, doc_id, rank)
    — any ranker's output (BM25, RRF, dense).  The query doc itself is
    excluded from position numbering and from the ideal.

    Scale: relevance is a postings ⋈ broadcast-query-terms join (the
    same candidate bound as BM25 itself); the ideal ordering is a
    per-query window over those candidates; every terminal is BIGINT.
    """
    postings, _ = bm25_postings(docs)
    return eval_ndcg_from_postings(postings, queries, ranked, k=k)


def eval_ndcg_from_postings(
    postings: DataFrame, queries: DataFrame, ranked: DataFrame, k: int = TOPK
) -> DataFrame:
    """:func:`eval_ndcg` over a PREBUILT postings table (r14, guide
    §2.4) — lets a caller that already paid the tokenize (the registered
    eval entry, a persisted-index evaluation) share it instead of
    re-tokenizing the corpus for the relevance join."""
    d_case = F.expr(_D_CASE_POS)
    ranked_pos = (
        ranked.filter(F.col("doc_id") != F.col("query_id"))
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("rank")
            ),
        )
        .filter(F.col("pos") <= k)
    )
    rel = (
        queries.select("query_id", "term")
        .distinct()
        .join(postings.select("doc_id", "term"), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.least(F.countDistinct("term"), F.lit(3)).alias("rel"))
    )
    dcg = (
        ranked_pos.join(rel, ["query_id", "doc_id"], "left")
        .withColumn("rel", F.coalesce("rel", F.lit(0)))
        .groupBy("query_id")
        .agg(F.sum(F.col("rel") * d_case).cast("bigint").alias("dcg_milli"))
    )
    ideal = rel.withColumn(
        "pos",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("rel"), F.asc("doc_id")
            )
        ),
    ).filter(F.col("pos") <= k)
    idcg = ideal.groupBy("query_id").agg(
        F.sum(F.col("rel") * d_case).cast("bigint").alias("idcg_milli")
    )
    firstrel = (
        ranked_pos.join(rel, ["query_id", "doc_id"])
        .filter(F.col("rel") >= 1)
        .groupBy("query_id")
        .agg(F.min("pos").alias("fp"))
    )
    return (
        dcg.join(idcg, "query_id", "left")
        .join(firstrel, "query_id", "left")
        .select(
            "query_id",
            "dcg_milli",
            F.coalesce("idcg_milli", F.lit(0)).cast("bigint").alias(
                "idcg_milli"
            ),
            F.when(F.coalesce("idcg_milli", F.lit(0)) == 0, F.lit(0))
            .otherwise(
                F.expr("(1000000 * dcg_milli) div idcg_milli")
            )
            .cast("bigint")
            .alias("ndcg_ppm"),
            F.coalesce(F.expr("1000 div fp"), F.lit(0))
            .cast("bigint")
            .alias("mrr_milli"),
        )
        .orderBy("query_id")
    )


@_register_standalone(
    "search_eval_ndcg", _EVAL_ORACLE.format(core=_BM25_CORE_CTES)
)
def search_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@{TOPK}/MRR of the certified BM25 sweep against term-overlap
    graded relevance — the retrieval family's evaluation row."""
    docs = load_table(spark, sf_dir, "documents")
    probes = docs.filter((F.col("doc_id") % 100 == 3) & (F.col("doc_id") < 500))
    queries = probes.select(
        F.col("doc_id").alias("query_id"),
        F.explode(
            F.slice(F.split(F.col("text"), " "), 1, QUERY_PREFIX_TOKENS)
        ).alias("term"),
    ).distinct()
    # one tokenize for the whole evaluation (r14, guide §2.4): the r13
    # form built the postings four times per run — ranking (postings +
    # stats corpus re-scan) and relevance each re-derived them from
    # ``docs``.  The postings table is checkpointed once; ranking stats
    # derive from it (bit-equal — _stats_from_postings) and the
    # relevance join reads the same materialized table.
    postings, _ = bm25_postings(docs)
    postings = postings.localCheckpoint(eager=True)
    ranked = bm25_topk_from_index(
        postings, _stats_from_postings(postings), queries, k=TOPK + 1
    )
    return eval_ndcg_from_postings(postings, queries, ranked)
