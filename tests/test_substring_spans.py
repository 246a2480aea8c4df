"""Goldens for cross-document exact substring span extraction.

The differential gate (test_oracle_queries) already certifies the
operator against the DuckDB oracle at sf0.01; these goldens pin the
SEMANTICS on a planted corpus — maximality, the minimum-length cut,
and single-document repetition staying silent — so a future refactor
cannot drift both engines together.
"""

from __future__ import annotations

import pytest

from data_ingestion_backend_spark.operators.dedup import (
    SPAN_MIN_TOKENS,
    SPAN_NGRAM,
    dedup_substring_spans,
)


def _words(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{i}" for i in range(n)]


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    """Corpus with one copied passage, one too-short shared run, and one
    doc that repeats a phrase only within itself."""
    base = tmp_path_factory.mktemp("spans")
    passage = _words("shared", SPAN_MIN_TOKENS + 3)  # 15 tokens, verbatim in 2 docs
    short = _words("run", SPAN_NGRAM)  # exactly detectable, below the cut
    self_rep = _words("echo", SPAN_NGRAM)
    rows = [
        # doc 0: unique prefix (5 tokens) + passage + unique suffix
        (0, " ".join(_words("a", 5) + passage + _words("b", 6))),
        # doc 1: passage at offset 2
        (1, " ".join(_words("c", 2) + passage + _words("d", 9))),
        # docs 2+3 share exactly SPAN_NGRAM tokens (< SPAN_MIN_TOKENS)
        (2, " ".join(_words("e", 4) + short + _words("f", 4))),
        (3, " ".join(_words("g", 4) + short + _words("h", 4))),
        # doc 4 repeats a phrase twice WITHIN itself only — df stays 1
        (4, " ".join(self_rep + _words("x", 3) + self_rep)),
    ]
    spark.createDataFrame(
        [(i, t, "en", "planted", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(base / "documents.parquet"))
    return str(base)


def test_maximal_spans_and_min_length_cut(spark, planted):
    got = {
        (r.doc_id, r.span_start, r.span_len)
        for r in dedup_substring_spans(spark, planted).collect()
    }
    # Exactly the two copies of the long passage, each MAXIMAL (the
    # unique surroundings are not absorbed); the SPAN_NGRAM-token run in
    # docs 2/3 is detected but cut by SPAN_MIN_TOKENS; doc 4's
    # self-repetition never reaches df>=2.
    assert got == {
        (0, 5, SPAN_MIN_TOKENS + 3),
        (1, 2, SPAN_MIN_TOKENS + 3),
    }


def test_whole_doc_duplicate_is_one_full_span(spark, tmp_path):
    text = " ".join(_words("w", 30))
    spark.createDataFrame(
        [(i, text, "en", "planted", len(text)) for i in (0, 1)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = sorted(
        (r.doc_id, r.span_start, r.span_len)
        for r in dedup_substring_spans(spark, str(tmp_path)).collect()
    )
    assert got == [(0, 0, 30), (1, 0, 30)]


def test_cut_removes_exactly_the_long_spans(spark, planted):
    from data_ingestion_backend_spark.operators.dedup import (
        dedup_substring_cut,
    )

    got = {
        r.doc_id: (r.n_kept, r.n_removed)
        for r in dedup_substring_cut(spark, planted).collect()
    }
    passage_len = SPAN_MIN_TOKENS + 3
    # docs 0/1 lose exactly the copied passage; the short shared run in
    # docs 2/3 and doc 4's self-repetition survive untouched
    assert got[0] == (5 + 6, passage_len)
    assert got[1] == (2 + 9, passage_len)
    assert got[2] == (4 + SPAN_NGRAM + 4, 0)
    assert got[3] == (4 + SPAN_NGRAM + 4, 0)
    assert got[4] == (2 * SPAN_NGRAM + 3, 0)
