"""End-to-end corpus curation: the verdict pass a pre-training data build
actually ships.

Composes the individually-certified operators — near-dup clustering
(``dedup.dedup_clusters``), quality/PII/token stats
(``text.text_doc_stats``), language ID (``text.text_lang_id``),
repetition scoring and length filtering (``mlprep``) — into one
per-document decision table: ``keep`` plus an explicit, deterministic
``drop_reasons`` list, and the PII-redacted text for the survivors.

This is the integration artifact the standalone operators exist for; it
is golden-tested (the verdict must agree with each source signal
row-by-row) rather than registry-certified — every constituent signal
already has a driver-graded oracle row, and the composition here is pure
column logic over their joined outputs.

Scale shape: every input is keyed by doc_id and produced by operators
whose own shuffle story is documented in SCALE.md; the joins add only
doc_id hash exchanges (AQE picks broadcast where a side is small), and
the verdict itself is a projection.  At 100 TB this runs as one DAG —
nothing here materializes to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.dedup import dedup_clusters
from data_ingestion_backend_spark.operators.mlprep import (
    prep_length_deciles,
    prep_repetition,
)
from data_ingestion_backend_spark.operators.text import (
    redact_pii,
    text_doc_stats,
    text_lang_id,
)
from data_ingestion_backend_spark.sources.fixtures import load_table

MIN_QUALITY = 0.75
MAX_TOP_BIGRAM_FRAC = 0.5
KNOWN_LANGS = ("en", "es", "pt", "fr", "de")


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    min_quality: float = MIN_QUALITY,
    max_top_bigram_frac: float = MAX_TOP_BIGRAM_FRAC,
) -> DataFrame:
    """Per-document keep/drop verdict with explicit reasons.

    Drop rules (each contributes a stable reason tag, in fixed order so
    the reasons string is deterministic):

    - ``near_dup``      — not the canonical member of its near-dup cluster
    - ``low_quality``   — composite quality score < ``min_quality``
    - ``repetitive``    — top-bigram fraction > ``max_top_bigram_frac``
    - ``unknown_lang``  — stopword voting produced no known language
    - ``length_outlier``— outside the per-source 5th–95th length band

    Output: (doc_id, keep, drop_reasons, n_tokens_bpe, clean_text) where
    ``clean_text`` is the PII-redacted text for kept docs, NULL otherwise.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stats = text_doc_stats(spark, sf_dir).select("doc_id", "quality", "n_tokens_bpe")
    lang = text_lang_id(spark, sf_dir).select("doc_id", "lang_pred")
    rep = prep_repetition(spark, sf_dir).select("doc_id", "top_bigram_frac")
    dec = prep_length_deciles(spark, sf_dir).select("doc_id", "length_filter")
    clusters = dedup_clusters(spark, sf_dir).select("doc_id", "is_canonical")

    joined = (
        docs.join(stats, "doc_id")
        .join(lang, "doc_id")
        .join(rep, "doc_id")
        .join(dec, "doc_id")
        .join(clusters, "doc_id")
    )
    reason = [
        F.when(~F.col("is_canonical"), F.lit("near_dup")),
        F.when(F.col("quality") < min_quality, F.lit("low_quality")),
        F.when(F.col("top_bigram_frac") > max_top_bigram_frac, F.lit("repetitive")),
        F.when(~F.col("lang_pred").isin(*KNOWN_LANGS), F.lit("unknown_lang")),
        F.when(F.col("length_filter") == "clip", F.lit("length_outlier")),
    ]
    reasons = F.filter(F.array(*reason), lambda x: x.isNotNull())
    keep = F.size(reasons) == 0
    return joined.select(
        "doc_id",
        keep.alias("keep"),
        F.concat_ws(",", reasons).alias("drop_reasons"),
        "n_tokens_bpe",
        F.when(keep, redact_pii(F.col("text"))).alias("clean_text"),
    ).orderBy("doc_id")
