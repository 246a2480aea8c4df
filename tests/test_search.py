"""Golden properties of the BM25 lexical retrieval operator.

The cross-engine score/rank contract is certified by the standalone
differential oracle (`test_oracle_queries.py::...[search_bm25_topk]`);
these tests pin the retrieval-quality properties an oracle can't state:
planted relevance, rank shape, and candidate-set bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.search import (
    QUERY_PREFIX_TOKENS,
    TOPK,
    bm25_postings,
    bm25_topk,
    search_bm25_topk,
)
from data_ingestion_backend_spark.sources.fixtures import load_table
from tests.conftest import SF_DIR_ORACLE


def test_planted_relevant_doc_ranks_first(spark):
    """On a controlled corpus, the one doc containing the query's rare
    discriminative terms must outrank docs that only match common terms —
    the core idf ordering property.  (The fixture corpus shares a tiny
    uniform vocabulary, so self-retrieval there is not a sound invariant;
    this planted corpus is.)"""
    docs = spark.createDataFrame(
        [
            (0, "quantum flux capacitor alignment notes"),
            (1, "table row join table row join table row"),
            (2, "the quick brown fox jumps over the dog"),
            (3, "flux measurements and table of results"),
        ],
        ["doc_id", "text"],
    )
    queries = spark.createDataFrame(
        [(7, "quantum"), (7, "flux"), (7, "capacitor")], ["query_id", "term"]
    )
    rows = sorted(bm25_topk(docs, queries).collect(), key=lambda r: r.rank)
    assert rows[0].doc_id == 0 and rows[0].query_id == 7
    # doc 3 matches only the mid-idf 'flux' term → strictly lower score
    scores = {r.doc_id: r.score for r in rows}
    assert scores[0] > scores.get(3, 0.0)
    # docs 1 and 2 share no query term → never scored
    assert set(scores) == {0, 3}


def test_rank_contiguous_and_scores_monotone(spark):
    out = search_bm25_topk(spark, SF_DIR_ORACLE).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= TOPK
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True), f"query {qid} not monotone"
        assert all(s > 0 for s in scores)


def test_candidates_limited_to_term_matches(spark):
    """Docs sharing no term with the query are never scored — the
    inverted-index contract that keeps 100 TB retrieval off the
    all-pairs path."""
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    queries = spark.createDataFrame(
        [(0, "zzz_not_in_corpus"), (1, "table")], ["query_id", "term"]
    )
    out = bm25_topk(docs, queries)
    rows = out.collect()
    assert all(r.query_id == 1 for r in rows), "termless query produced hits"
    # every hit really contains the term
    hit_ids = [r.doc_id for r in rows]
    with_term = {
        r.doc_id
        for r in docs.filter(
            F.array_contains(F.split(F.col("text"), " "), "table")
        ).collect()
    }
    assert set(hit_ids) <= with_term


def test_postings_stats_shape(spark):
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    postings, stats = bm25_postings(docs)
    s = stats.collect()[0]
    assert s.n_docs == docs.count()
    assert s.avgdl > 0
    # postings are distinct (doc, term) with positive tf and constant dl per doc
    bad = (
        postings.groupBy("doc_id")
        .agg(F.countDistinct("dl").alias("ndl"))
        .filter(F.col("ndl") != 1)
        .count()
    )
    assert bad == 0
    assert postings.filter(F.col("tf") <= 0).count() == 0


def test_query_prefix_constant_matches_oracle_text():
    """The SQL oracle embeds the prefix length; keep the Python constant
    and the oracle text in lock-step."""
    from data_ingestion_backend_spark.operators.search import _BM25_ORACLE

    assert f"[1:{QUERY_PREFIX_TOKENS}]" in _BM25_ORACLE


# --- hybrid RRF fusion -------------------------------------------------------

def test_rrf_consensus_beats_single_arm(spark):
    """A doc ranked mid-list by BOTH arms must outrank a doc that only
    one arm ranked (even first): 1/(60+3)+1/(60+3) > 1/(60+1)."""
    from data_ingestion_backend_spark.operators.search import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 100, 1), (1, 200, 3)], "query_id long, doc_id long, rnk long"
    )
    den = spark.createDataFrame(
        [(1, 300, 1), (1, 200, 3)], "query_id long, doc_id long, rnk long"
    )
    rows = sorted(rrf_fuse([lex, den]).collect(), key=lambda r: r.rank)
    assert rows[0].doc_id == 200, "consensus doc did not win fusion"
    # both single-arm rank-1 docs tie exactly and break by doc_id
    assert [r.doc_id for r in rows[1:]] == [100, 300]
    assert rows[1].rrf == rows[2].rrf


def test_hybrid_rrf_end_to_end_shape(spark):
    from data_ingestion_backend_spark.operators.search import (
        TOPK,
        search_hybrid_rrf,
    )

    out = search_hybrid_rrf(spark, SF_DIR_ORACLE).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 5  # probe ids 3,103,203,303,403
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= TOPK
        # fused scores are bounded by |arms| / (k+1)
        assert all(0 < r.rrf <= 2.0 / 61.0 + 1e-9 for r in rows)


def test_max_df_guard_drops_ubiquitous_terms_only(spark):
    """The hot-term defense: a term in every doc must stop generating
    candidates when max_df_frac is set, while rare terms still retrieve —
    and a query of ONLY ubiquitous terms degrades to empty, not to a
    corpus scan."""
    docs = spark.createDataFrame(
        [(i, f"common filler{i} payload{i % 7}") for i in range(40)]
        + [(100, "common rareterm payload1")],
        ["doc_id", "text"],
    )
    queries = spark.createDataFrame(
        [(1, "common"), (1, "rareterm"), (2, "common")], ["query_id", "term"]
    )
    exact = bm25_topk(docs, queries)
    guarded = bm25_topk(docs, queries, max_df_frac=0.5)

    # exact: query 2 (only 'common') matches everything
    assert {r.query_id for r in exact.collect()} == {1, 2}
    g = guarded.collect()
    # guarded: 'common' (df=41/41) is dropped → query 2 returns nothing,
    # query 1 still finds the rareterm doc
    assert {r.query_id for r in g} == {1}
    assert [r.doc_id for r in g] == [100]


def test_incremental_index_matches_rebuild_bit_for_bit(spark, tmp_path):
    """Maintenance contract of the persisted BM25 index: build on 90% of
    the corpus, append the remaining 10% as a batch, and search results
    must equal a from-scratch build over the full corpus EXACTLY —
    integer score grid, ranks, and tie-breaks included.  The appended
    batch is tokenized once; the corpus is never re-tokenized (postings
    are corpus-independent facts, which is why BM25 appends cheaply)."""
    from data_ingestion_backend_spark.operators.search import (
        QUERY_PREFIX_TOKENS,
        append_to_search_index,
        bm25_topk,
        bm25_topk_persisted,
        build_search_index,
    )
    from data_ingestion_backend_spark.sources.warehouse import Warehouse

    docs = load_table(spark, SF_DIR_ORACLE, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    queries = (
        docs.filter((F.col("doc_id") % 100 == 3) & (F.col("doc_id") < 500))
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(
                F.slice(F.split(F.col("text"), " "), 1, QUERY_PREFIX_TOKENS)
            ).alias("term"),
        )
        .distinct()
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    build_search_index(wh, corpus)
    append_to_search_index(wh, batch)

    got = bm25_topk_persisted(wh, queries)
    want = bm25_topk(docs, queries)
    as_set = lambda df: {tuple(r) for r in df.collect()}
    assert as_set(got) == as_set(want)
    assert as_set(got), "no results — vacuous"


def test_append_on_unbuilt_index_is_build(spark, tmp_path):
    """An index never built reads as EMPTY (search tables registered in
    models.SCHEMAS): the first append IS the build — no
    KeyError('search_postings'), and searching after it equals a
    from-scratch build over the same docs."""
    from data_ingestion_backend_spark.operators.search import (
        QUERY_PREFIX_TOKENS,
        append_to_search_index,
        bm25_topk,
        bm25_topk_persisted,
    )
    from data_ingestion_backend_spark.sources.warehouse import Warehouse

    docs = load_table(spark, SF_DIR_ORACLE, "documents").select("doc_id", "text")
    sub = docs.filter(F.col("doc_id") < 300)
    queries = (
        sub.filter(F.col("doc_id") % 100 == 3)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(
                F.slice(F.split(F.col("text"), " "), 1, QUERY_PREFIX_TOKENS)
            ).alias("term"),
        )
        .distinct()
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    append_to_search_index(wh, sub)  # never built — must not raise
    as_set = lambda df: {tuple(r) for r in df.collect()}
    got = as_set(bm25_topk_persisted(wh, queries))
    assert got == as_set(bm25_topk(sub, queries))
    assert got, "no results — vacuous"


def test_append_with_batch_id_is_exactly_once(spark, tmp_path):
    """batch_id opts the append into the txn protocol: a re-delivered id
    is a no-op, and a crash between the postings write and the marker
    makes the re-run REPLACE its partial commit (base-pinned rebuild)."""
    from data_ingestion_backend_spark.operators.search import (
        SEARCH_POSTINGS_TABLE,
        SEARCH_STATS_TABLE,
        append_to_search_index,
        build_search_index,
    )
    from data_ingestion_backend_spark.sources.warehouse import Warehouse
    from data_ingestion_backend_spark.streaming import txn

    docs = load_table(spark, SF_DIR_ORACLE, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)

    wh = Warehouse(spark, str(tmp_path / "wh"))
    build_search_index(wh, corpus)
    append_to_search_index(wh, batch, batch_id=0)
    n_postings = wh.read(SEARCH_POSTINGS_TABLE).count()
    stats = wh.read(SEARCH_STATS_TABLE).collect()[0]

    # re-delivery: no-op
    append_to_search_index(wh, batch, batch_id=0)
    assert wh.read(SEARCH_POSTINGS_TABLE).count() == n_postings
    assert wh.read(SEARCH_STATS_TABLE).collect()[0] == stats

    # crash window: postings committed, marker not — re-run must not stack
    wh2 = Warehouse(spark, str(tmp_path / "wh2"))
    build_search_index(wh2, corpus)

    class Boom(RuntimeError):
        pass

    real = txn.write_atomic

    def crash_on_marker(path, payload):
        if path.endswith("_last_batch"):
            raise Boom()
        real(path, payload)

    import unittest.mock as mock

    with mock.patch.object(txn, "write_atomic", crash_on_marker):
        try:
            append_to_search_index(wh2, batch, batch_id=0)
        except Boom:
            pass
    append_to_search_index(wh2, batch, batch_id=0)  # re-delivery
    assert wh2.read(SEARCH_POSTINGS_TABLE).count() == n_postings
    assert wh2.read(SEARCH_STATS_TABLE).collect()[0] == stats


def test_hard_negatives_exclude_positive_and_rerank(spark):
    """The positive (query_id == doc_id, which ranks first for
    prefix-derived queries) never appears; ranks are contiguous from 1
    and each query yields exactly N_HARD_NEGATIVES rows; the negatives
    are exactly the BM25 top list with the positive removed."""
    from data_ingestion_backend_spark.operators.search import (
        N_HARD_NEGATIVES,
        search_bm25_topk,
        search_hard_negatives,
    )
    from tests.conftest import SF_DIR_SMALL

    neg = search_hard_negatives(spark, SF_DIR_SMALL).collect()
    by_q = {}
    for r in neg:
        assert r["doc_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r)
    top = search_bm25_topk(spark, SF_DIR_SMALL).collect()
    top_by_q = {}
    for r in top:
        top_by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        ranks = [r["neg_rank"] for r in rows]
        assert ranks == list(range(1, N_HARD_NEGATIVES + 1))
        want = [
            r["doc_id"] for r in top_by_q[q] if r["doc_id"] != q
        ][:N_HARD_NEGATIVES]
        assert [r["doc_id"] for r in rows] == want


def test_tfidf_keywords_semantics(spark):
    """Planted corpus: a term unique to one doc out-scores corpus-wide
    terms; ubiquitous terms (df == N -> idf exactly 0) never rank above
    a rarer term; each doc yields at most k rows with contiguous ranks."""
    from data_ingestion_backend_spark.operators.search import (
        KEYWORDS_PER_DOC,
        tfidf_keywords,
    )

    rows = [(i, f"common filler words unique{i} extra{i % 2}") for i in range(10)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tfidf_keywords(docs).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in by_doc.items():
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= KEYWORDS_PER_DOC
        # the doc-unique term (df=1) is always the top keyword
        assert rs[0]["term"] == f"unique{d}"
        # df == N terms score exactly 0 and can never beat extra{d%2} (df=5)
        zero_terms = {"common", "filler", "words"}
        scores = {r["term"]: r["score_i"] for r in rs}
        for t in zero_terms & set(scores):
            assert scores[t] == 0

def test_dense_arrow_candidates_match_catalyst_twin(spark):
    """The r14 Arrow dense-arm kernel must reproduce the pre-r14
    crossJoin × cosine_expr × full-window arm EXACTLY: same (query_id,
    doc_id, rnk) triples after rounding and tie-breaks.  The kernel
    claims bit-identical doubles (left-to-right fold) plus a provably
    safe prune margin; this differential would catch either claim
    failing on real fixture vectors."""
    from pyspark.sql.window import Window

    from data_ingestion_backend_spark.operators.search import (
        TOPK,
        _dense_candidates_arrow,
        dense_topk_catalyst,
    )

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    qv = emb.filter((F.col("vec_id") % 100 == 3) & (F.col("vec_id") < 500)).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    old = sorted(
        dense_topk_catalyst(emb, qv).collect(),
        key=lambda r: (r.query_id, r.rnk),
    )
    q_rows = [(r["query_id"], r["qe"]) for r in qv.collect()]
    cand = _dense_candidates_arrow(emb, q_rows, topk=TOPK)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cos"), 6)), F.asc("doc_id")
    )
    new = sorted(
        cand.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= TOPK)
        .select("query_id", "doc_id", "rnk")
        .collect(),
        key=lambda r: (r.query_id, r.rnk),
    )
    assert [tuple(r) for r in new] == [tuple(r) for r in old]

    # and the raw kernel doubles are bit-identical to the Catalyst fold
    from data_ingestion_backend_spark.operators.dedup import cosine_expr

    raw_old = {
        (r.query_id, r.doc_id): r.c
        for r in emb.crossJoin(F.broadcast(qv))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            cosine_expr(F.col("e"), F.col("qe")).alias("c"),
        )
        .collect()
    }
    for r in cand.collect():
        assert raw_old[(r.query_id, r.doc_id)] == r.cos, (
            f"kernel double differs from Catalyst fold at {(r.query_id, r.doc_id)}"
        )
