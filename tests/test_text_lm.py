"""Goldens for the bigram-LM surprisal quality signal (text_lm_surprisal).

The cross-engine oracle lives in the standalone differential gate
(tests/test_oracle_queries.py); these tests pin the SEMANTICS on planted
corpora: common phrasing scores less surprising than unique phrasing,
the whole-bit quantization invariants hold, and sub-bigram documents
are excluded rather than scored.
"""

from __future__ import annotations

from data_ingestion_backend_spark.operators.text import bigram_surprisal


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_common_phrasing_scores_lower_than_rare(spark):
    # 20 documents repeat the same sentence → its bigrams are corpus-common;
    # one document is made of singleton bigrams → every step is maximally
    # surprising under the corpus model.
    common = [(i, "the cat sat on the mat") for i in range(20)]
    rare = [(100, "zeta omicron quixote vermilion arbalest")]
    out = {
        r["doc_id"]: r["surprisal_millibits"]
        for r in bigram_surprisal(_docs(spark, common + rare)).collect()
    }
    assert out[100] > out[0]
    # every common doc scores identically (same text, corpus-level model)
    assert len({out[i] for i in range(20)}) == 1


def test_quantization_invariants(spark):
    rows = [(i, f"alpha beta gamma delta w{i} alpha beta") for i in range(8)]
    for r in bigram_surprisal(_docs(spark, rows)).collect():
        # bits >= 1 per bigram -> mean milli-bits >= 1000
        assert r["surprisal_millibits"] >= 1000
        assert r["surprisal_millibits"] == (1000 * r["sum_bits"]) // r["n_bigrams"]
        assert r["n_bigrams"] >= 1


def test_sub_bigram_docs_excluded(spark):
    rows = [(1, "solo"), (2, "two words here")]
    got = bigram_surprisal(_docs(spark, rows)).collect()
    assert [r["doc_id"] for r in got] == [2]


def test_deterministic_rerun(spark):
    rows = [(i, f"repeat token w{i % 3} repeat token") for i in range(10)]
    a = bigram_surprisal(_docs(spark, rows)).collect()
    b = bigram_surprisal(_docs(spark, rows)).collect()
    assert a == b
