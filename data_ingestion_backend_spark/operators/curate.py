"""End-to-end corpus curation: the verdict pass a pre-training data build
actually ships.

Composes the individually-certified operators — near-dup clustering
(``dedup.dedup_clusters``), quality/PII/token stats
(``text.text_doc_stats``), language ID (``text.text_lang_id``),
repetition scoring and length filtering (``mlprep``) — into one
per-document decision table: ``keep`` plus an explicit, deterministic
``drop_reasons`` list, and the PII-redacted text for the survivors.

This is the integration artifact the standalone operators exist for.
Beyond the golden tests (the verdict must agree with each source signal
row-by-row), the composed E2E verdict carries its own DuckDB
differential oracle in the standalone registry: the already-oracled
signal SQL texts are embedded as CTEs and the keep/drop/redact logic is
re-expressed in SQL, so the composition itself — not just each signal —
is cross-engine checked.

Scale shape: every input is keyed by doc_id and produced by operators
whose own shuffle story is documented in SCALE.md; the joins add only
doc_id hash exchanges (AQE picks broadcast where a side is small), and
the verdict itself is a projection.  At 100 TB this runs as one DAG —
nothing here materializes to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.dedup import (
    _minhash_ctes,
    dedup_clusters,
)
from data_ingestion_backend_spark.operators.queries import (
    ORACLE,
    STANDALONE_ORACLES,
    _register_standalone,
)
from data_ingestion_backend_spark.operators.text import (
    PII_PATTERNS,
    redact_pii,
)
from data_ingestion_backend_spark.sources.fixtures import load_table

MIN_QUALITY = 0.75
MAX_TOP_BIGRAM_FRAC = 0.5
KNOWN_LANGS = ("en", "es", "pt", "fr", "de")


def _curate_oracle_sql() -> str:
    """DuckDB twin of the composed verdict, built FROM the constituent
    oracles: each signal's already-certified SQL text is embedded as a CTE
    (DuckDB allows a nested WITH inside a CTE body), the cluster closure
    re-uses the shared recursive minhash CTE chain, and the keep/drop/
    redact logic mirrors :func:`curate_corpus` clause for clause."""
    redacted = "r.text"
    for _, pat, repl in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pat}', '{repl}', 'g')"
    langs = ", ".join(f"'{x}'" for x in KNOWN_LANGS)
    return f"""
WITH RECURSIVE {_minhash_ctes()},
  und AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION ALL
    SELECT doc_b AS a, doc_a AS b FROM pairs
  ),
  reach(id, lbl) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT u.b, r.lbl FROM reach r JOIN und u ON u.a = r.id
  ),
  clus AS (
    SELECT id AS doc_id, MIN(lbl) = id AS is_canonical
    FROM reach GROUP BY id
  ),
  stats AS ({ORACLE["text_doc_stats"]}),
  lang AS ({ORACLE["text_lang_id"]}),
  rep AS ({STANDALONE_ORACLES["prep_repetition"]}),
  dec AS ({STANDALONE_ORACLES["prep_length_deciles"]}),
  verdict AS (
    SELECT d.doc_id,
           concat_ws(',',
             CASE WHEN NOT c.is_canonical THEN 'near_dup' END,
             CASE WHEN s.quality < {MIN_QUALITY} THEN 'low_quality' END,
             CASE WHEN rp.top_bigram_frac > {MAX_TOP_BIGRAM_FRAC}
                  THEN 'repetitive' END,
             CASE WHEN l.lang_pred NOT IN ({langs}) THEN 'unknown_lang' END,
             CASE WHEN de.length_filter = 'clip' THEN 'length_outlier' END
           ) AS drop_reasons,
           s.n_tokens_bpe, d.text
    FROM documents d
    JOIN stats s USING (doc_id)
    JOIN lang l USING (doc_id)
    JOIN rep rp USING (doc_id)
    JOIN dec de USING (doc_id)
    JOIN clus c USING (doc_id)
  )
SELECT r.doc_id,
       (r.drop_reasons = '') AS keep,
       r.drop_reasons,
       r.n_tokens_bpe,
       CASE WHEN r.drop_reasons = '' THEN {redacted} END AS clean_text
FROM verdict r ORDER BY r.doc_id"""


def curate_frame(
    spark: SparkSession,
    sf_dir: str,
    min_quality: float = MIN_QUALITY,
    max_top_bigram_frac: float = MAX_TOP_BIGRAM_FRAC,
) -> DataFrame:
    """The curate verdict without the registered entry's terminal sort —
    composed consumers (the corpus build's quality gate, the datasheet's
    keep arm) feed it into doc_id joins where row order is irrelevant.

    r14 (composed-pipeline constant, guide §2.4): the r13 form joined
    FIVE separately-registered signal frames, each of which re-scanned
    ``documents``, re-joined its aggregate back onto its own doc list,
    and sorted by doc_id — 5 scans, 9 joins, 5 sorts for one verdict.
    The signals' certified expressions are unchanged (shared builders:
    ``quality_expr``/``bpe_token_count`` projections inline,
    ``_repetition_agg``+``repetition_frac_expr``, ``_lang_votes``+
    coalesce-'und', ``length_filter_arm``'s identical window) but now
    compose over ONE documents scan with one LEFT join per aggregated
    signal — the same rows, a third of the plan.
    """
    from data_ingestion_backend_spark.operators.mlprep import (
        _repetition_agg,
        length_filter_arm,
        repetition_frac_expr,
    )
    from data_ingestion_backend_spark.operators.text import (
        _lang_votes,
        bpe_token_count,
        quality_expr,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text")
    rep = _repetition_agg(base)
    lang = _lang_votes(base)
    dec = length_filter_arm(docs.select("doc_id", "source", "n_chars"))
    clusters = dedup_clusters(spark, sf_dir).select("doc_id", "is_canonical")

    joined = (
        base.join(rep, "doc_id", "left")
        .join(lang, "doc_id", "left")
        .join(dec, "doc_id")
        .join(clusters, "doc_id")
    )
    quality = F.round(quality_expr(), 2)  # = text_doc_stats's quality
    top_frac = repetition_frac_expr()  # = prep_repetition's top_bigram_frac
    lang_pred = F.coalesce(F.col("lang"), F.lit("und"))  # = text_lang_id's
    reason = [
        F.when(~F.col("is_canonical"), F.lit("near_dup")),
        F.when(quality < min_quality, F.lit("low_quality")),
        F.when(top_frac > max_top_bigram_frac, F.lit("repetitive")),
        F.when(~lang_pred.isin(*KNOWN_LANGS), F.lit("unknown_lang")),
        F.when(F.col("length_filter") == "clip", F.lit("length_outlier")),
    ]
    reasons = F.filter(F.array(*reason), lambda x: x.isNotNull())
    keep = F.size(reasons) == 0
    return joined.select(
        "doc_id",
        keep.alias("keep"),
        F.concat_ws(",", reasons).alias("drop_reasons"),
        bpe_token_count(F.col("text")).alias("n_tokens_bpe"),
        F.when(keep, redact_pii(F.col("text"))).alias("clean_text"),
    )


@_register_standalone("curate_corpus", _curate_oracle_sql())
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
    return curate_frame(
        spark, sf_dir, min_quality, max_top_bigram_frac
    ).orderBy("doc_id")
