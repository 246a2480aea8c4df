"""Golden tests for the end-to-end corpus-curation verdict pass."""

from __future__ import annotations

from data_ingestion_backend_spark.operators.curate import (
    KNOWN_LANGS,
    MAX_TOP_BIGRAM_FRAC,
    MIN_QUALITY,
    curate_corpus,
)
from data_ingestion_backend_spark.operators.dedup import dedup_clusters
from data_ingestion_backend_spark.operators.mlprep import (
    prep_length_deciles,
    prep_repetition,
)
from data_ingestion_backend_spark.operators.text import text_doc_stats, text_lang_id
from tests.conftest import SF_DIR_SMALL


def test_curation_verdicts_agree_with_source_signals(spark):
    verdicts = {r["doc_id"]: r for r in curate_corpus(spark, SF_DIR_SMALL).collect()}
    stats = {r["doc_id"]: r for r in text_doc_stats(spark, SF_DIR_SMALL).collect()}
    lang = {r["doc_id"]: r for r in text_lang_id(spark, SF_DIR_SMALL).collect()}
    rep = {r["doc_id"]: r for r in prep_repetition(spark, SF_DIR_SMALL).collect()}
    dec = {r["doc_id"]: r for r in prep_length_deciles(spark, SF_DIR_SMALL).collect()}
    cc = {r["doc_id"]: r for r in dedup_clusters(spark, SF_DIR_SMALL).collect()}

    assert set(verdicts) == set(stats)  # one verdict per document
    n_kept = n_dropped = 0
    for doc_id, v in verdicts.items():
        expected = []
        if not cc[doc_id]["is_canonical"]:
            expected.append("near_dup")
        if stats[doc_id]["quality"] < MIN_QUALITY:
            expected.append("low_quality")
        if rep[doc_id]["top_bigram_frac"] > MAX_TOP_BIGRAM_FRAC:
            expected.append("repetitive")
        if lang[doc_id]["lang_pred"] not in KNOWN_LANGS:
            expected.append("unknown_lang")
        if dec[doc_id]["length_filter"] == "clip":
            expected.append("length_outlier")
        got = v["drop_reasons"].split(",") if v["drop_reasons"] else []
        assert got == expected, (doc_id, got, expected)
        assert v["keep"] == (not expected)
        assert (v["clean_text"] is not None) == v["keep"]
        n_kept += v["keep"]
        n_dropped += not v["keep"]
    # the fixture corpus plants near-dups and length outliers exist by
    # construction, so the pass must actually drop something — and keep
    # the bulk of the corpus
    assert n_dropped > 0
    assert n_kept > n_dropped
