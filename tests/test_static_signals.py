"""The incremental build's fused per-doc signal pass must equal the
composed certified frames it replaced.

``_static_signals`` fuses the repetition filter (``repetition_frame``)
and the language vote (``lang_pred_frame``) into one tagged explode +
two hash aggregations (r13 job-floor shave).  The fusion is an
EXECUTION-shape change only; this golden pins row-for-row equality with
the original three-frame composition over the fixture corpus — tie
lengths, short docs (no bigrams), zero-stopword docs (lang "und"), and
the ``round(frac, 6)`` boundary all ride along in the natural data, and
a planted row exercises each edge explicitly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.corpus_incremental import (
    _static_signals,
)
from data_ingestion_backend_spark.operators.curate import (
    KNOWN_LANGS,
    MAX_TOP_BIGRAM_FRAC,
    MIN_QUALITY,
)
from data_ingestion_backend_spark.operators.mlprep import repetition_frame
from data_ingestion_backend_spark.operators.text import (
    lang_pred_frame,
    quality_expr,
)
from data_ingestion_backend_spark.sources.fixtures import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _composed(batch):
    """The pre-fusion composition, verbatim."""
    sig = batch.select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        "text",
        F.size(F.split("text", " ")).cast("bigint").alias("n_raw"),
        (quality_expr() >= MIN_QUALITY).alias("_q"),
    )
    rep = repetition_frame(batch).select(
        "doc_id", (F.col("top_bigram_frac") <= MAX_TOP_BIGRAM_FRAC).alias("_r")
    )
    lng = lang_pred_frame(batch).select(
        "doc_id", F.col("lang_pred").isin(*KNOWN_LANGS).alias("_l")
    )
    return (
        sig.join(rep, "doc_id")
        .join(lng, "doc_id")
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            "text",
            "n_raw",
            (F.col("_q") & F.col("_r") & F.col("_l")).alias("static_ok"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fused_signals_equal_composed_on_fixture(spark):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "source", "n_chars", "text"
    )
    assert _rows(_static_signals(docs)) == _rows(_composed(docs))


@pytest.mark.parametrize(
    "text",
    [
        "",  # empty: one empty token, no bigrams, no stopwords
        "solo",  # single token: no bigrams
        "the the the the the",  # repeated bigram, en stopwords
        "la la the the",  # cross-language vote tie
        "x y x y x y x y",  # frac exactly at a rounding-visible ratio
        "THE The the El eL",  # lowercasing before the vote
    ],
)
def test_fused_signals_equal_composed_on_planted_edges(spark, text):
    docs = spark.createDataFrame(
        [(1, "en", "s1", len(text), text), (2, "es", "s2", 7, "el que no a en")],
        "doc_id bigint, lang string, source string, n_chars bigint, text string",
    )
    assert _rows(_static_signals(docs)) == _rows(_composed(docs))
