"""Prefix-filtered exact Jaccard join: recall-lossless candidate generation.

The oracle gate (tests/test_oracle_queries.py) already certifies
``dedup_jaccard_prefix`` against the UNFILTERED quadratic ground truth;
these tests pin the two claims the oracle can't see directly — that the
filter actually prunes (candidate bound) and that completeness holds on
an adversarial hot-shingle corpus where df-pruning provably loses pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR_ORACLE
from data_ingestion_backend_spark.operators.dedup import (
    NGRAM_MAX_DF,
    PREFIX_JACCARD_T,
    _docs_shingled,
    _verify_jaccard,
    dedup_jaccard_prefix,
    dedup_ngram_jaccard,
    docs_shingled_frame,
    minhash_per_doc_frame,
    prefix_filtered_candidates,
)


def test_prefix_candidates_strictly_prune(spark):
    """The prefix filter must generate strictly fewer candidates than the
    unfiltered posting join — otherwise it's just the quadratic join with
    extra plan steps."""
    sh = _docs_shingled(spark, SF_DIR_ORACLE)
    pref_n = prefix_filtered_candidates(sh, PREFIX_JACCARD_T).count()
    a = sh.select(F.col("doc_id").alias("doc_a"), "s")
    b = sh.select(F.col("doc_id").alias("doc_b"), "s")
    full_n = (
        a.join(b, "s")
        .filter("doc_a < doc_b")
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    assert pref_n < full_n / 2, f"prefix={pref_n} vs full={full_n}: no real pruning"
    assert pref_n > 0


def test_prefix_recall_superset_of_df_pruned(spark):
    """The df-pruned cert has a recall CONTRACT (pairs sharing only hot
    shingles are lost); the prefix filter has a recall THEOREM.  On any
    corpus, prefix pairs ⊇ df-pruned pairs at the same threshold."""
    pruned = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, SF_DIR_ORACLE).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_jaccard_prefix(spark, SF_DIR_ORACLE).collect()
    }
    assert pruned <= exact
    assert exact, "no Jaccard pairs in fixture — test is vacuous"


def _hot_shingle_corpus(spark):
    """Every doc shares one ubiquitous 3-token prefix, so every shingle
    it contributes has df = |corpus| > NGRAM_MAX_DF — pairs whose overlap
    lives in those shingles are invisible to df-pruning by construction,
    while the prefix filter must still find them."""
    hot = "the quick fox"
    rows = [(i, f"{hot} tail{i} tail{i} end{i}") for i in range(20)]
    # docs 100/101 are near-identical: they differ only in the final token,
    # sharing the hot prefix shingles AND their own rare middle shingles.
    rows += [
        (100, f"{hot} jumps over lazy dogs tonight"),
        (101, f"{hot} jumps over lazy dogs today"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_shingle_completeness_vs_naive(spark):
    """Planted adversarial corpus: guarded result == all-pairs truth."""
    docs = _hot_shingle_corpus(spark)
    sh = docs_shingled_frame(docs)
    per_doc = minhash_per_doc_frame(docs).select("doc_id", "ss", "n")
    t = PREFIX_JACCARD_T
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in _verify_jaccard(
            per_doc, prefix_filtered_candidates(sh, t), t
        ).collect()
    }
    all_pairs = (
        per_doc.select(F.col("doc_id").alias("doc_a"))
        .crossJoin(per_doc.select(F.col("doc_id").alias("doc_b")))
        .filter("doc_a < doc_b")
    )
    want = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in _verify_jaccard(per_doc, all_pairs, t).collect()
    }
    assert got == want
    assert (100, 101) in {(a, b) for a, b, _ in got}, "planted near-dup pair missed"
    # the hot shingles really are above the df cap (the df-pruned blind spot)
    hot_df = (
        sh.groupBy("s")
        .count()
        .filter(F.col("count") > NGRAM_MAX_DF)
        .count()
    )
    assert hot_df > 0, "corpus failed to plant a hot shingle"
