"""Planted golden for span-level decontamination.

The differential gate certifies the fixture corpus (thin at sf0.01 —
one genuine overlap); this planted corpus pins the semantics: exact
span offsets for a leaked test passage, and that the val split
participates on NEITHER side.

Bucket facts (md5(doc_id)[:8] % 100): doc 0/1/2 → train (<98),
doc 40 → val (=98), doc 30 → test (≥99).  Verified in-test so a split
constant change fails loudly instead of silently blunting the golden.
"""

from __future__ import annotations

import hashlib

import pytest

from data_ingestion_backend_spark.operators.mlprep import (
    DECON_SPAN_NGRAM,
    TRAIN_PCT,
    VAL_PCT,
    prep_decontaminate_spans,
)

TRAIN_A, TRAIN_B, VAL_DOC, TEST_DOC = 0, 1, 40, 30


def _bucket(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100


def _words(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{k}" for k in range(n)]


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    assert _bucket(TRAIN_A) < TRAIN_PCT
    assert _bucket(TRAIN_B) < TRAIN_PCT
    assert TRAIN_PCT <= _bucket(VAL_DOC) < TRAIN_PCT + VAL_PCT
    assert _bucket(TEST_DOC) >= TRAIN_PCT + VAL_PCT

    leaked = _words("leak", DECON_SPAN_NGRAM + 4)  # 12-token test passage
    valish = _words("vv", DECON_SPAN_NGRAM + 4)
    rows = [
        # train doc A: 3-token prefix + leaked passage + suffix
        (TRAIN_A, " ".join(_words("a", 3) + leaked + _words("b", 5))),
        # train doc B: shares a passage with the VAL doc only → no span
        (TRAIN_B, " ".join(valish + _words("c", 4))),
        (VAL_DOC, " ".join(_words("d", 2) + valish)),
        (TEST_DOC, " ".join(_words("e", 4) + leaked)),
    ]
    base = tmp_path_factory.mktemp("deconspans")
    spark.createDataFrame(
        [(i, t, "en", "planted", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(base / "documents.parquet"))
    return str(base)


def test_leaked_passage_located_val_ignored(spark, planted):
    got = {
        (r.doc_id, r.span_start, r.span_len)
        for r in prep_decontaminate_spans(spark, planted).collect()
    }
    # exactly one contaminated span: the leaked passage inside train doc
    # A at offset 3.  Train doc B's overlap is with the VAL split and
    # must not be reported; test docs themselves are never output.
    assert got == {(TRAIN_A, 3, DECON_SPAN_NGRAM + 4)}
