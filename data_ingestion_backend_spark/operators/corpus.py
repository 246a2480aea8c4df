"""The capstone: ONE end-to-end pre-training corpus build, certified as
ONE query.

Every stage below is an individually-certified operator; this module
composes them into the pipeline a pretraining data team actually runs
and cross-engine-checks the COMPOSITION — the only place cross-operator
schema/semantic drift can hide (the ``curate.curate_corpus`` composed-
verdict precedent, extended to the full chain):

1. **curate** — quality / repetition / language / length gates
   (``curate.curate_corpus``'s verdict, minus its near-dup reason:
   dedup is stage 2's job here, with a better keep rule).
2. **dedup** — near-dup clusters over the FULL corpus
   (``dedup.dedup_clusters``: MinHash-LSH → verified Jaccard → CC
   closure; exact duplicates are a special case — identical shingle
   sets collide in every band), then QUALITY-AWARE canonical keep among
   the curate survivors (``dedup.dedup_canonical_quality``'s rule:
   longest copy wins, ties to the lower id) — the best surviving copy
   of each cluster, not the lowest id.
3. **span decontamination** — every cross-document-repeated span among
   the survivors is CUT from the text
   (``dedup.substring_cut_tokens_frame``): dedup removed duplicate
   DOCUMENTS, this removes duplicated PASSAGES (boilerplate,
   contamination) while keeping the documents.
4. **DSIR scoring** — importance weight of each cleaned document toward
   the corpus's English slice (``mlprep.dsir_weights`` on the CLEANED
   text — scoring after decontamination, so boilerplate can't buy
   importance).
5. **token-budget cut** — greedy quality-prefix selection
   (``mlprep.token_budget_select``) at ``BUDGET_PCT``% of the cleaned
   token total, scored by the DSIR rate coarsened to
   ``CORPUS_DSIR_TIER``-milli-bit tiers (the documented distinct-score-
   domain precondition: the raw rate's cardinality approaches the doc
   count; tiers keep the histogram bounded by the score DOMAIN).
6. **leakage-free split** — train/val/test by md5 of the NEAR-DUP
   CLUSTER id (``mlprep.split_leakage_free``), so no cluster straddles
   a split boundary.
7. **pack** — selected train docs stream into fixed-token-budget
   sequences (``prep_pack_sequences``'s shard + running-sum shape).

Output: ONE row per original document —
(doc_id, stage, n_tokens_clean, score_tier, selected, split, pack_id)
where ``stage`` is the first gate that dropped the doc ('quality',
'dup', 'budget') or 'kept'.

Scale shape: each stage's own 100 TB story is documented at its
definition site; the composition adds only doc_id-keyed hash joins.
Stage outputs that fan out to multiple consumers (the curate verdict,
the survivor set, the cleaned corpus, the budget decision) are
localCheckpoint-ed — at production scale each is a persisted table
between pipeline runs (exactly how the warehouse family materializes
state), so no stage ever re-derives an upstream stage; the plan-pin
test asserts the FINAL assembly reads the raw corpus exactly once.

Reference anchor: the reference validates, dedups (whole-row hash —
src/services/csv_validator.py), stages, and publishes one dataset per
job; this operator is that ingest contract scaled to a corpus build
(gate → dedup → clean → score → cut → split → pack as one atomic
decision table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.curate import (
    KNOWN_LANGS,
    MAX_TOP_BIGRAM_FRAC,
    MIN_QUALITY,
    curate_frame,
)
from data_ingestion_backend_spark.operators.dedup import (
    _minhash_ctes,
    _span_ctes_body,
    SPAN_MIN_TOKENS,
    dedup_clusters,
    substring_cut_tokens_frame,
)
from data_ingestion_backend_spark.operators.mlprep import (
    BUDGET_PCT,
    DSIR_BUCKETS,
    PACK_BUDGET_TOKENS,
    PACK_SHARDS,
    TRAIN_PCT,
    VAL_PCT,
    dsir_weights_tagged,
    split_leakage_free,
    token_budget_select,
)
from data_ingestion_backend_spark.operators.queries import (
    ORACLE,
    STANDALONE_ORACLES,
    _register,
    _register_standalone,
)
from data_ingestion_backend_spark.sources.fixtures import load_table

#: DSIR rate (milli-bits/gram) tier width for the budget cut — the
#: raw rate's domain approaches the doc count; div by this keeps the
#: budget histogram bounded by the SCORE domain (≤ ~800 levels).
CORPUS_DSIR_TIER = 100
#: score tier for survivors with < 2 cleaned tokens (no grams → no DSIR
#: rate): below any reachable tier, so they are selected last.
CORPUS_LOW_TIER = -(1 << 20)


def _corpus_oracle_sql() -> str:
    """DuckDB twin of the COMPOSED build: the recursive minhash/CC chain
    is hoisted to the top level once (the curate-oracle pattern), the
    already-certified signal SQL is embedded as nested CTEs, and every
    later stage is re-expressed clause-for-clause over the previous
    stage's CTE — an independent end-to-end evaluation of the same
    pipeline."""
    langs = ", ".join(f"'{x}'" for x in KNOWN_LANGS)
    B = DSIR_BUCKETS
    bucket = (
        "CAST(('0x' || substr(md5(CAST(cluster_id AS STRING)), 1, 8))"
        " AS BIGINT) % 100"
    )
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
  labels AS MATERIALIZED (SELECT id AS doc_id, MIN(lbl) AS cluster_id
             FROM reach GROUP BY id),
  stats AS ({ORACLE["text_doc_stats"]}),
  lang AS ({ORACLE["text_lang_id"]}),
  rep AS ({STANDALONE_ORACLES["prep_repetition"]}),
  dec AS ({STANDALONE_ORACLES["prep_length_deciles"]}),
  qual AS MATERIALIZED (
    SELECT d.doc_id,
           (s.quality >= {MIN_QUALITY}
            AND rp.top_bigram_frac <= {MAX_TOP_BIGRAM_FRAC}
            AND l.lang_pred IN ({langs})
            AND de.length_filter <> 'clip') AS q_ok
    FROM documents d
    JOIN stats s USING (doc_id)
    JOIN lang l USING (doc_id)
    JOIN rep rp USING (doc_id)
    JOIN dec de USING (doc_id)
  ),
  ntoks AS MATERIALIZED (
    SELECT doc_id, len(string_split(text, ' ')) AS n_raw FROM documents
  ),
  dupkeep AS (
    SELECT q.doc_id, lb.cluster_id,
           ROW_NUMBER() OVER (PARTITION BY lb.cluster_id
                              ORDER BY n.n_raw DESC, q.doc_id) AS rn
    FROM qual q
    JOIN labels lb USING (doc_id)
    JOIN ntoks n USING (doc_id)
    WHERE q.q_ok
  ),
  surv AS MATERIALIZED (SELECT doc_id, cluster_id FROM dupkeep WHERE rn = 1),
  sdocs AS MATERIALIZED (
    SELECT d.doc_id, d.lang, d.text FROM documents d JOIN surv USING (doc_id)
  ),
  {_span_ctes_body("sdocs")},
  covered AS MATERIALIZED (
    SELECT DISTINCT doc_id,
           unnest(range(span_start + 1, span_start + span_len + 1)) AS pos1
    FROM spans WHERE span_len >= {SPAN_MIN_TOKENS}
  ),
  pos AS (
    SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos1, unnest(t) AS tok
    FROM toks
  ),
  keptpos AS MATERIALIZED (
    SELECT p.doc_id, p.pos1, p.tok
    FROM pos p LEFT JOIN covered c
      ON c.doc_id = p.doc_id AND c.pos1 = p.pos1
    WHERE c.pos1 IS NULL
  ),
  cleangrp AS MATERIALIZED (
    SELECT doc_id, list(tok ORDER BY pos1) AS t
    FROM keptpos GROUP BY doc_id
  ),
  clean AS MATERIALIZED (
    SELECT s.doc_id, s.lang,
           COALESCE(c.t, CAST([] AS VARCHAR[])) AS t
    FROM sdocs s LEFT JOIN cleangrp c USING (doc_id)
  ),
  cgrams AS MATERIALIZED (
    SELECT doc_id, lang,
           CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % {B} AS b
    FROM (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i + 1])) AS g
      FROM clean WHERE len(t) >= 2
    )
  ),
  cdoc_b AS (SELECT doc_id, b, COUNT(*) AS k FROM cgrams GROUP BY doc_id, b),
  csrc AS (SELECT b, COUNT(*) AS cs FROM cgrams GROUP BY b),
  ctgt AS (SELECT b, COUNT(*) AS ct FROM cgrams WHERE lang = 'en' GROUP BY b),
  ctot AS (
    SELECT (SELECT COUNT(*) FROM cgrams) AS ts,
           (SELECT COUNT(*) FROM cgrams WHERE lang = 'en') AS tt
  ),
  clam AS (
    SELECT s.b,
           CASE WHEN (COALESCE(ct, 0) + 1) * (ts + {B})
                     >= (cs + 1) * (tt + {B})
                THEN CAST(length(bin(
                       ((COALESCE(ct, 0) + 1) * (ts + {B}))
                       // ((cs + 1) * (tt + {B})))) AS BIGINT) - 1
                ELSE 1 - CAST(length(bin(
                       ((cs + 1) * (tt + {B}))
                       // ((COALESCE(ct, 0) + 1) * (ts + {B})))) AS BIGINT)
           END AS lam
    FROM csrc s LEFT JOIN ctgt USING (b) CROSS JOIN ctot
  ),
  cscored AS (
    SELECT d.doc_id, SUM(d.k) AS n_grams, SUM(d.k * l.lam) AS w_bits
    FROM cdoc_b d JOIN clam l USING (b)
    GROUP BY d.doc_id
  ),
  scored AS MATERIALIZED (
    SELECT c.doc_id,
           CAST(len(c.t) AS BIGINT) AS n_tokens,
           CAST(COALESCE(
             ((1000 * s.w_bits) // s.n_grams) // {CORPUS_DSIR_TIER},
             {CORPUS_LOW_TIER}) AS BIGINT) AS score
    FROM clean c LEFT JOIN cscored s USING (doc_id)
  ),
  btot AS (SELECT SUM(n_tokens) * {BUDGET_PCT} // 100 AS budget FROM scored),
  bhist AS (SELECT score, SUM(n_tokens) AS st FROM scored GROUP BY score),
  bcum AS (
    SELECT score,
           SUM(st) OVER (ORDER BY score DESC
                         ROWS UNBOUNDED PRECEDING) - st AS before_tokens
    FROM bhist
  ),
  bwithin AS (
    SELECT doc_id, score, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY score ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum_in_score
    FROM scored
  ),
  sel AS MATERIALIZED (
    SELECT w.doc_id, w.score, w.n_tokens,
           (c.before_tokens + w.cum_in_score <= t.budget) AS selected
    FROM bwithin w JOIN bcum c USING (score) CROSS JOIN btot t
  ),
  spl AS MATERIALIZED (
    SELECT s.doc_id,
           CASE WHEN {bucket} < {TRAIN_PCT} THEN 'train'
                WHEN {bucket} < {TRAIN_PCT + VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM sel s JOIN surv USING (doc_id)
    WHERE s.selected
  ),
  packed AS MATERIALIZED (
    SELECT p.doc_id,
           CAST(COALESCE(SUM(s.n_tokens) OVER (
                  PARTITION BY p.doc_id % {PACK_SHARDS} ORDER BY p.doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                // {PACK_BUDGET_TOKENS} AS BIGINT) AS pack_id
    FROM spl p JOIN sel s USING (doc_id)
    WHERE p.split = 'train'
  )
SELECT d.doc_id,
       CASE WHEN NOT q.q_ok THEN 'quality'
            WHEN v.doc_id IS NULL THEN 'dup'
            WHEN NOT s.selected THEN 'budget'
            ELSE 'kept' END AS stage,
       CAST(s.n_tokens AS BIGINT) AS n_tokens_clean,
       CAST(s.score AS BIGINT) AS score_tier,
       COALESCE(s.selected, FALSE) AS selected,
       sp.split,
       pk.pack_id
FROM documents d
JOIN qual q USING (doc_id)
LEFT JOIN surv v USING (doc_id)
LEFT JOIN sel s USING (doc_id)
LEFT JOIN spl sp USING (doc_id)
LEFT JOIN packed pk USING (doc_id)
ORDER BY d.doc_id"""


def corpus_build_frame(
    docs: DataFrame,
    qual: DataFrame,
    labels: DataFrame,
) -> DataFrame:
    """The composed build over prepared inputs: ``docs`` (doc_id, lang,
    text), ``qual`` (doc_id, q_ok — the curate verdict minus its
    near-dup reason), ``labels`` (doc_id, cluster_id — full-corpus
    near-dup closure).  See the module block for the stage list."""
    spark = docs.sparkSession

    # stage 2 — quality-aware canonical keep among curate survivors
    ntoks = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_raw")
    )
    w_keep = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_raw"), F.asc("doc_id")
    )
    surv = (
        qual.filter("q_ok")
        .join(labels, "doc_id")
        .join(ntoks, "doc_id")
        .withColumn("rn", F.row_number().over(w_keep))
        .filter(F.col("rn") == 1)
        .select("doc_id", "cluster_id")
        .localCheckpoint(eager=True)  # feeds cut, split, final assembly
    )

    # stage 3 — span decontamination among survivors (cleaned corpus is
    # the persisted stage output at production scale)
    cut = substring_cut_tokens_frame(
        docs.join(surv.select("doc_id"), "doc_id").select("doc_id", "text")
    )
    clean = (
        cut.join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            F.size("t_clean").cast("bigint").alias("n_clean"),
            F.array_join("t_clean", " ").alias("text"),
        )
        .localCheckpoint(eager=True)
    )

    # stage 4 — DSIR on the CLEANED text, target = cleaned English slice
    # (single-gram-pass tagged form, bit-equal — see dsir_weights_tagged)
    scores = dsir_weights_tagged(
        clean.select(
            "doc_id", (F.col("lang") == "en").alias("is_tgt"), "text"
        ),
        "is_tgt",
    )

    # stage 5 — token-budget cut on DSIR tiers.  The budget scalar rides
    # the scored checkpoint as an observed metric (r14): sum(n_tokens)
    # over the very rows the checkpoint materializes — one job instead
    # of checkpoint + a separate aggregation action.
    from pyspark.sql import Observation

    budget_obs = Observation("corpus_budget")
    scored = (
        clean.select("doc_id", "n_clean")
        .join(scores.select("doc_id", "rate_mbits"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.expr(f"rate_mbits div {CORPUS_DSIR_TIER}"),
                F.lit(CORPUS_LOW_TIER),
            )
            .cast("bigint")
            .alias("score"),
            F.col("n_clean").alias("n_tokens"),
        )
        .observe(
            budget_obs,
            F.expr(f"sum(n_tokens) * {BUDGET_PCT} div 100").alias("budget"),
        )
        .localCheckpoint(eager=True)  # budget scalar + selection + pack
    )
    budget = budget_obs.get["budget"]
    sel = token_budget_select(scored, int(budget or 0)).localCheckpoint(
        eager=True
    )

    # stage 6 — leakage-free split of the selected docs
    spl = split_leakage_free(
        surv.join(sel.filter("selected").select("doc_id"), "doc_id")
    ).select("doc_id", "split")

    # stage 7 — pack selected train docs into fixed-token sequences
    w_pack = (
        Window.partitionBy(F.expr(f"doc_id % {PACK_SHARDS}"))
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        spl.filter(F.col("split") == "train")
        .join(sel.select("doc_id", "n_tokens"), "doc_id")
        .select(
            "doc_id",
            F.floor(
                F.coalesce(F.sum("n_tokens").over(w_pack), F.lit(0))
                / PACK_BUDGET_TOKENS
            )
            .cast("bigint")
            .alias("pack_id"),
        )
    )

    return (
        docs.select("doc_id")
        .join(qual, "doc_id")
        .join(surv.select("doc_id", F.lit(True).alias("is_surv")), "doc_id", "left")
        .join(sel, "doc_id", "left")
        .join(spl, "doc_id", "left")
        .join(packed, "doc_id", "left")
        .select(
            "doc_id",
            F.when(~F.col("q_ok"), F.lit("quality"))
            .when(F.col("is_surv").isNull(), F.lit("dup"))
            .when(~F.col("selected"), F.lit("budget"))
            .otherwise(F.lit("kept"))
            .alias("stage"),
            F.col("n_tokens").cast("bigint").alias("n_tokens_clean"),
            F.col("score").cast("bigint").alias("score_tier"),
            F.coalesce("selected", F.lit(False)).alias("selected"),
            "split",
            "pack_id",
        )
        .orderBy("doc_id")
    )


# DRIVER-GRADED slot (round 11): the flagship composition occupies one of
# the 50 correctness rows — q14_like_predicate rotated to the standalone
# gate to free it (its P8/F11 operators stay golden-tested in
# test_sniff_rejects + the issue matrix, and the standalone form keeps
# the same DuckDB differential).
@_register("prep_corpus_e2e", _corpus_oracle_sql())
def prep_corpus_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pretraining corpus build over the documents fixture —
    curate → dedup (quality-aware keep) → span decontamination → DSIR
    score → token-budget cut → leakage-free split → pack, ONE decision
    row per document."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    # stage 1 — the certified curate verdict, minus its near-dup reason
    # (stage 2 owns dedup with the quality-aware keep rule); the
    # sort-free frame form — qual feeds doc_id joins only
    qual = (
        curate_frame(spark, sf_dir)
        .select(
            "doc_id",
            (
                F.size(
                    F.array_remove(
                        F.array_remove(F.split("drop_reasons", ","), "near_dup"),
                        "",
                    )
                )
                == 0
            ).alias("q_ok"),
        )
        .localCheckpoint(eager=True)
    )
    labels = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    return corpus_build_frame(docs, qual, labels)


def _datasheet_oracle_sql() -> str:
    """DuckDB twin of the per-source datasheet — the same hoisted
    recursive chain + embedded signal CTEs as the build oracle, with the
    curate keep predicate re-expressed clause-for-clause and every
    terminal an exact integer (permille / milli units — float means
    would diverge in the last ulp across engines)."""
    from data_ingestion_backend_spark.operators.text import PII_PATTERNS

    langs = ", ".join(f"'{x}'" for x in KNOWN_LANGS)
    pii_any = " + ".join(
        f"len(regexp_extract_all(d.text, '{pat}'))" for _, pat, _ in PII_PATTERNS
    )
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
  labels AS MATERIALIZED (SELECT id AS doc_id, MIN(lbl) AS cluster_id
             FROM reach GROUP BY id),
  stats AS ({ORACLE["text_doc_stats"]}),
  lang AS ({ORACLE["text_lang_id"]}),
  rep AS ({STANDALONE_ORACLES["prep_repetition"]}),
  dec AS ({STANDALONE_ORACLES["prep_length_deciles"]}),
  per_doc AS MATERIALIZED (
    SELECT d.source,
           s.n_tokens, s.n_chars_measured, s.quality,
           l.lang_pred,
           (lb.cluster_id = d.doc_id) AS is_canonical,
           ((lb.cluster_id = d.doc_id)
            AND s.quality >= {MIN_QUALITY}
            AND rp.top_bigram_frac <= {MAX_TOP_BIGRAM_FRAC}
            AND l.lang_pred IN ({langs})
            AND de.length_filter <> 'clip') AS keep,
           ({pii_any}) > 0 AS pii_doc
    FROM documents d
    JOIN stats s USING (doc_id)
    JOIN lang l USING (doc_id)
    JOIN rep rp USING (doc_id)
    JOIN dec de USING (doc_id)
    JOIN labels lb USING (doc_id)
  )
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars_measured) AS BIGINT) AS n_chars,
       CAST(1000 * SUM(CASE WHEN lang_pred = 'en' THEN 1 ELSE 0 END)
         // COUNT(*) AS BIGINT) AS en_permille,
       COUNT(DISTINCT lang_pred) AS n_langs,
       CAST(1000 * SUM(CASE WHEN is_canonical THEN 0 ELSE 1 END)
         // COUNT(*) AS BIGINT) AS dup_permille,
       CAST(1000 * SUM(CASE WHEN keep THEN 1 ELSE 0 END)
         // COUNT(*) AS BIGINT) AS kept_permille,
       CAST(SUM(CAST(quality * 1000 AS BIGINT)) // COUNT(*) AS BIGINT)
         AS quality_milli_mean,
       CAST(SUM(CASE WHEN pii_doc THEN 1 ELSE 0 END) AS BIGINT) AS pii_docs,
       MIN(n_tokens) AS min_tokens,
       MAX(n_tokens) AS max_tokens
FROM per_doc GROUP BY source ORDER BY source"""


# DRIVER-GRADED slot (round 11): rotated in beside the capstone —
# q34_pivot moved standalone (its conditional-agg mechanism is the twin
# of the still-graded q33 rollup and keeps its DuckDB differential).
@_register("prep_corpus_datasheet", _datasheet_oracle_sql())
def prep_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The datasheet a corpus build publishes: one row per SOURCE with
    size (docs / tokens / chars), observed language mix (predicted-
    English permille, distinct predicted languages), near-dup rate
    (non-canonical permille), curation yield (kept permille), mean
    quality (milli units — per-doc quality is dyadic {0, .25, .5, .75,
    1}, so the integer cast is exact), PII-bearing doc count, and the
    token-length envelope.

    Composes the certified signals (doc stats, lang-id, clusters, the
    curate verdict) exactly as the build does — this is the REPORT for
    the corpus `prep_corpus_e2e` ships, and what a data card's
    quantitative section is generated from.

    Scale shape: every input is a certified per-doc projection; the
    composition adds doc_id hash joins plus ONE map-side-combined
    per-source aggregation; output is |sources| rows.  All terminals
    are integers (permille/milli) — exact at any scale, no float-mean
    ulp drift between engines.
    """
    from data_ingestion_backend_spark.operators.text import (
        _lang_votes,
        pii_counts,
        quality_expr,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    # r14 (composed-pipeline constant): the stats arm's columns are pure
    # per-doc projections of the same certified expression builders
    # (size(split), length, quality_expr) — computed inline on the ONE
    # documents scan instead of joining a second scan; the lang arm
    # LEFT-joins the vote aggregation core directly (missing → 'und',
    # text_lang_id's exact null semantics).  2 scans + 5 joins → 1 scan
    # + 3 joins; every value identical (oracle row-hash gate).
    lang = _lang_votes(docs.select("doc_id", "text"))
    # Checkpoint the two CC-closure consumers (the capstone's stage-table
    # pattern): the curate verdict EMBEDS its own dedup_clusters arm, and
    # Spark does not dedupe common subplans (SCALE.md §2) — one un-pinned
    # plan would run TWO concurrent closures over the pair graph, which
    # OOMed at the 100× planted-clique tier; checkpointed, each runs once
    # and the final plan joins two narrow id-keyed tables.
    clus = (
        dedup_clusters(spark, sf_dir)
        .select("doc_id", "is_canonical")
        .localCheckpoint(eager=True)
    )
    keep = (
        curate_frame(spark, sf_dir)  # sort-free: feeds a doc_id join
        .select("doc_id", "keep")
        .localCheckpoint(eager=True)
    )
    pii_any = None
    for c in pii_counts(F.col("text")).values():
        pii_any = c if pii_any is None else pii_any + c
    per_doc = (
        docs.join(lang, "doc_id", "left")
        .join(clus, "doc_id")
        .join(keep, "doc_id")
        .select(
            "source",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
            F.length("text").cast("bigint").alias("n_chars_measured"),
            F.round(quality_expr(), 2).alias("quality"),
            F.coalesce(F.col("lang"), F.lit("und")).alias("lang_pred"),
            "is_canonical",
            "keep",
            (pii_any > 0).alias("pii_doc"),
        )
    )
    cnt = F.count(F.lit(1))
    return (
        per_doc.groupBy("source")
        .agg(
            cnt.alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_chars_measured").alias("n_chars"),
            F.expr(
                "1000 * sum(CASE WHEN lang_pred = 'en' THEN 1 ELSE 0 END)"
                " div count(*)"
            ).alias("en_permille"),
            F.countDistinct("lang_pred").alias("n_langs"),
            F.expr(
                "1000 * sum(CASE WHEN is_canonical THEN 0 ELSE 1 END)"
                " div count(*)"
            ).alias("dup_permille"),
            F.expr(
                "1000 * sum(CASE WHEN keep THEN 1 ELSE 0 END) div count(*)"
            ).alias("kept_permille"),
            F.expr(
                "sum(CAST(quality * 1000 AS BIGINT)) div count(*)"
            ).alias("quality_milli_mean"),
            F.sum(F.when(F.col("pii_doc"), 1).otherwise(0))
            .cast("bigint")
            .alias("pii_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("source")
    )


# --- materialization: the artifact a training loader actually reads ---------

CORPUS_BUILD_TABLE = "corpus_build"
CORPUS_PACKS_TABLE = "corpus_train_packs"


def materialize_corpus_build(
    wh, spark: SparkSession, sf_dir: str, eos: str = " <eos> "
) -> dict:
    """Ship the build: run :func:`prep_corpus_e2e` and publish BOTH the
    per-document decision table and the packed TRAIN corpus — the
    selected train docs' CLEANED (span-cut) text concatenated per
    (shard, pack_id) in doc_id order, EOS-separated — in ONE atomic
    manifest (`Warehouse.publish`): a training loader can never see a
    pack whose decision rows have not landed, or vice versa.

    The packed text re-derives the survivors' cleaned tokens with the
    same :func:`substring_cut_tokens_frame` over the same survivor set
    the build scored (deterministic, so re-runs are content-identical —
    golden-tested), and the session-memoized pair/label tables make the
    re-derivation one cut pass, not a second dedup.

    Scale shape: `materialize_packs`'s one-shuffle collect shape over
    the TRAIN-selected subset; pack sizes are bounded by the token
    budget, so no collect_list outgrows an executor.  Returns the
    staged {table: version} map."""
    from data_ingestion_backend_spark.operators.mlprep import PACK_SHARDS

    decisions = prep_corpus_e2e(spark, sf_dir).localCheckpoint(eager=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    surv_ids = decisions.filter(
        F.col("stage").isin("kept", "budget")
    ).select("doc_id")
    clean = substring_cut_tokens_frame(docs.join(surv_ids, "doc_id")).select(
        "doc_id", F.array_join("t_clean", " ").alias("text_clean")
    )
    train = decisions.filter("selected AND split = 'train'").select(
        "doc_id",
        "n_tokens_clean",
        "pack_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
    )
    member = F.array_sort(F.collect_list(F.struct("doc_id", "text_clean")))
    packs = (
        train.join(clean, "doc_id")
        .groupBy("shard", "pack_id")
        .agg(
            member.alias("_m"),
            F.sum("n_tokens_clean").cast("bigint").alias("pack_tokens"),
            F.count("*").cast("bigint").alias("n_docs"),
        )
        .select(
            "shard",
            "pack_id",
            F.concat_ws(eos, F.expr("transform(_m, x -> x.text_clean)")).alias(
                "packed_text"
            ),
            "pack_tokens",
            "n_docs",
        )
    )
    staged = {
        CORPUS_BUILD_TABLE: wh.stage(CORPUS_BUILD_TABLE, decisions),
        CORPUS_PACKS_TABLE: wh.stage(CORPUS_PACKS_TABLE, packs),
    }
    wh.publish(staged)
    return staged
