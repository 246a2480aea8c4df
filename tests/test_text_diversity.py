"""Goldens for the per-source n-gram diversity profile (text_ngram_diversity).

Cross-engine oracle runs in the standalone differential gate; these pin
the semantics on planted corpora: a template-spam source reads near-zero
diversity, a unique-text source reads 1.0 (1e6 ppm), and the integer-ppm
invariants hold.
"""

from __future__ import annotations

from data_ingestion_backend_spark.operators.text import ngram_diversity


def _profile(spark, rows):
    df = spark.createDataFrame(rows, ["source", "text"])
    return {r["source"]: r.asDict() for r in ngram_diversity(df).collect()}


def test_spam_vs_diverse_sources(spark):
    spam = [("spam", "buy now cheap deal") for _ in range(50)]
    diverse = [("wiki", f"w{4 * i} w{4 * i + 1} w{4 * i + 2} w{4 * i + 3}") for i in range(50)]
    out = _profile(spark, spam + diverse)
    # template spam: 4 distinct tokens over 200 positions, 2 distinct trigrams over 100
    assert out["spam"]["ttr_ppm"] == (1_000_000 * 4) // 200
    assert out["spam"]["trigram_diversity_ppm"] == (1_000_000 * 2) // 100
    # fully unique text: every token and trigram distinct
    assert out["wiki"]["ttr_ppm"] == 1_000_000
    assert out["wiki"]["trigram_diversity_ppm"] == 1_000_000
    assert out["spam"]["trigram_diversity_ppm"] < out["wiki"]["trigram_diversity_ppm"]


def test_ppm_invariants(spark):
    rows = [("s", "a b a c a b d"), ("s", "a b a")]
    out = _profile(spark, rows)["s"]
    assert out["ttr_ppm"] == (1_000_000 * out["distinct_tokens"]) // out["n_tokens"]
    assert (
        out["trigram_diversity_ppm"]
        == (1_000_000 * out["distinct_trigrams"]) // out["n_trigrams"]
    )
    # 10 tokens, 4 distinct; trigrams: doc1 has 5 positions, doc2 has 1
    assert out["n_tokens"] == 10 and out["distinct_tokens"] == 4
    assert out["n_trigrams"] == 6


def test_short_docs_skip_trigrams_not_tokens(spark):
    rows = [("s", "x y"), ("s", "p q r s")]
    out = _profile(spark, rows)["s"]
    assert out["n_tokens"] == 6          # both docs count tokens
    assert out["n_trigrams"] == 2        # only the 4-token doc has trigrams
