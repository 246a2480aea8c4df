"""Retrieval evaluation (nDCG@k / MRR): hand-computed integer goldens on
planted rankings — the fixture's BM25 sweep retrieves its term-overlap
judgments perfectly (nDCG ≡ 1.0, covered by the uniform oracle gate), so
the metric arithmetic is certified here on deliberately imperfect lists."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.search import (
    NDCG_DISCOUNTS,
    eval_ndcg,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "a b x"),
            (3, "a x y"),
            (4, "x y z"),
        ],
        "doc_id long, text string",
    )


def _queries(spark):
    return spark.createDataFrame(
        [(99, "a"), (99, "b"), (99, "c")], "query_id long, term string"
    )


def _ranked(spark, order):
    return spark.createDataFrame(
        [(99, d, i + 1) for i, d in enumerate(order)],
        "query_id long, doc_id long, rank long",
    )


def test_ndcg_hand_computed_on_bad_ranking(spark):
    """rel: d1=3 (a,b,c), d2=2 (a,b), d3=1 (a), d4=0.  Ranking
    [d4, d1, d3, d2] → DCG = 3·D2 + 1·D3 + 2·D4; IDCG = 3·D1 + 2·D2 +
    1·D3; MRR = 1000 div 2 (first relevant at position 2)."""
    D = NDCG_DISCOUNTS
    [row] = eval_ndcg(
        _docs(spark), _queries(spark), _ranked(spark, [4, 1, 3, 2])
    ).collect()
    dcg = 3 * D[1] + 1 * D[2] + 2 * D[3]
    idcg = 3 * D[0] + 2 * D[1] + 1 * D[2]
    assert row["dcg_milli"] == dcg
    assert row["idcg_milli"] == idcg
    assert row["ndcg_ppm"] == (1_000_000 * dcg) // idcg
    assert row["mrr_milli"] == 500


def test_ndcg_perfect_ranking_is_one(spark):
    [row] = eval_ndcg(
        _docs(spark), _queries(spark), _ranked(spark, [1, 2, 3, 4])
    ).collect()
    assert row["ndcg_ppm"] == 1_000_000
    assert row["mrr_milli"] == 1000
    assert row["dcg_milli"] == row["idcg_milli"]


def test_ndcg_no_relevant_docs_is_zero(spark):
    queries = spark.createDataFrame(
        [(99, "zz"), (99, "qq")], "query_id long, term string"
    )
    [row] = eval_ndcg(
        _docs(spark), queries, _ranked(spark, [4, 3])
    ).collect()
    assert row["dcg_milli"] == 0
    assert row["idcg_milli"] == 0
    assert row["ndcg_ppm"] == 0
    assert row["mrr_milli"] == 0


def test_ndcg_excludes_query_doc_from_ranking_and_ideal(spark):
    """A result row whose doc IS the query doc must not occupy a
    position (later docs shift up) nor appear in the ideal."""
    D = NDCG_DISCOUNTS
    queries = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c")], "query_id long, term string"
    )
    # rank list led by the query doc itself: d1 is skipped, d2 takes
    # position 1 (rel 2), d3 position 2 (rel 1)
    ranked = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 2), (1, 3, 3)],
        "query_id long, doc_id long, rank long",
    )
    [row] = eval_ndcg(_docs(spark), queries, ranked).collect()
    assert row["dcg_milli"] == 2 * D[0] + 1 * D[1]
    assert row["idcg_milli"] == 2 * D[0] + 1 * D[1]  # ideal excludes d1 too
    assert row["ndcg_ppm"] == 1_000_000
    assert row["mrr_milli"] == 1000


def test_rel_caps_at_three(spark):
    """A doc matching more than 3 query terms still grades rel=3 (the
    cap keeps judgments on the standard 0-3 scale)."""
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a q q q q")], "doc_id long, text string"
    )
    queries = spark.createDataFrame(
        [(99, t) for t in "a b c d e".split()], "query_id long, term string"
    )
    ranked = spark.createDataFrame(
        [(99, 1, 1), (99, 2, 2)], "query_id long, doc_id long, rank long"
    )
    D = NDCG_DISCOUNTS
    [row] = eval_ndcg(docs, queries, ranked).collect()
    assert row["dcg_milli"] == 3 * D[0] + 1 * D[1]
