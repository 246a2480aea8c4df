"""Training-data preparation operators (LLM-pipeline stages beyond dedup).

The four pipeline stages every large-scale pre-training corpus build runs
after dedup/quality, each pure Catalyst with a dual-dialect DuckDB oracle:

- **repetition scoring** — Gopher-style duplicate-n-gram signal (the
  fraction of a document's bigrams claimed by its single most frequent
  bigram); high values flag boilerplate/spam for filtering.
- **IDF rarity scoring** — corpus-level document frequencies joined back
  per token; the mean-IDF score separates stock phrasing from rare
  content and is the building block for TF-IDF style filters.
- **deterministic split assignment** — content-hash bucketing into
  train/val/test.  Hash-of-id, not random(): re-runs, backfills, and
  incremental loads land every document in the same split forever.
- **sequence packing** — greedy token-budget packing of documents into
  fixed-size training sequences via a running-sum window; the standard
  concat-then-chunk approximation, shard-parallel.

Scale notes: repetition and IDF shuffle (doc_id, token)-sized rows with
map-side combine; split assignment is embarrassingly parallel (no
shuffle); packing shuffles once on the shard key and windows within the
shard — shard count scales with the cluster, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_ingestion_backend_spark.plans.localtable import local_df
from data_ingestion_backend_spark.operators.queries import _register
from data_ingestion_backend_spark.sources.fixtures import load_table

TRAIN_PCT, VAL_PCT = 98, 1  # remaining 1% = test
PACK_BUDGET_TOKENS = 512
PACK_SHARDS = 8
SAMPLE_PER_MILLE = 100  # stratified sample keep-rate: 100/1000 = 10%
DECON_NGRAM = 8  # contamination n-gram width (long n-grams are rare by design)


# standalone-form registrations live in the central local-gate registry
# (operators/queries.py): callable for pipeline use, locally oracled,
# not occupying one of the driver's 50 correctness slots.
from data_ingestion_backend_spark.operators.queries import (  # noqa: E402
    STANDALONE_ORACLES,
    STANDALONE_QUERIES,
    _register_standalone,
)


@_register_standalone(
    "prep_repetition",
    """WITH bg AS (
         SELECT doc_id, unnest(list_transform(
                  range(1, greatest(len(string_split(text, ' ')), 2)),
                  i -> string_split(text, ' ')[i] || ' ' ||
                       string_split(text, ' ')[i+1])) AS b
         FROM documents
         WHERE len(string_split(text, ' ')) >= 2
       ),
       per AS (
         SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b
       ),
       agg AS (
         SELECT doc_id, MAX(c) AS top_bigram_count, SUM(c) AS n_bigrams
         FROM per GROUP BY doc_id
       )
       SELECT d.doc_id,
              CAST(COALESCE(a.top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
              CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
              round(CASE WHEN a.n_bigrams > 0
                         THEN CAST(a.top_bigram_count AS DOUBLE) / a.n_bigrams
                         ELSE 0.0 END, 6) AS top_bigram_frac
       FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
       ORDER BY d.doc_id""",
)
def prep_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: top-bigram fraction per document.

    Two map-side-combined aggregations over (doc_id, bigram) rows — the
    same two-step tokenize-then-transform shingling as dedup (inlining
    split() into the lambda re-splits per element; see dedup.py).  Docs
    with fewer than two tokens have no bigrams and score 0.

    Measured negative result (r5): a fully ROW-LOCAL form (sort_array of
    the bigram array + an aggregate() run-length fold — zero shuffles)
    is 3× slower at sf0.1: higher-order-function lambdas are interpreted
    per element while the explode+groupBy path stays in codegen'd hash
    aggregation.  Shuffle-free is not free.
    """
    return repetition_frame(load_table(spark, sf_dir, "documents"))


def _repetition_agg(docs: DataFrame) -> DataFrame:
    """(doc_id, top_bigram_count, n_bigrams) for docs with ≥ 2 tokens —
    the aggregation core of :func:`repetition_frame`, exposed so composed
    consumers (the curate verdict) can LEFT-join it straight onto their
    own doc frame instead of paying this frame's internal join-back plus
    a second outer join (r14, composed-pipeline constant)."""
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("t")).filter(
        F.size("t") >= 2
    )
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(t)-2), i -> concat_ws(' ', t[i], t[i+1]))")
        ).alias("b"),
    )
    return (
        bg.groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_count"), F.sum("c").alias("n_bigrams"))
    )


def repetition_frac_expr() -> F.Column:
    """top_bigram_frac from the (nullable) `_repetition_agg` columns —
    shared by the standalone frame and the fused curate verdict so the
    two can never drift: null/zero n_bigrams scores 0.0 exactly."""
    return F.round(
        F.when(
            F.col("n_bigrams") > 0,
            F.col("top_bigram_count").cast("double") / F.col("n_bigrams"),
        ).otherwise(0.0),
        6,
    )


def repetition_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, top_bigram_count, n_bigrams, top_bigram_frac) for any
    (doc_id, text) frame — the frame core of ``prep_repetition``, reused
    by the incremental corpus build's per-batch signal pass."""
    agg = _repetition_agg(docs)
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("top_bigram_count", F.lit(0)).cast("bigint").alias(
                "top_bigram_count"
            ),
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            repetition_frac_expr().alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


@_register_standalone(
    "prep_idf_rarity",
    """WITH tok AS (
         SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS w
         FROM documents
       ),
       n AS (SELECT COUNT(*) AS n_docs FROM documents),
       dfreq AS (SELECT w, COUNT(*) AS df FROM tok GROUP BY w)
       SELECT t.doc_id,
              CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
              round(AVG(ln((n.n_docs + 1.0) / (f.df + 1.0))), 4) AS mean_idf
       FROM tok t CROSS JOIN n JOIN dfreq f ON f.w = t.w
       GROUP BY t.doc_id
       ORDER BY t.doc_id""",
)
def prep_idf_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean token IDF per document (corpus-rarity quality score).

    Document frequencies via COUNT() OVER (PARTITION BY token) on the
    distinct (doc, token) table: the token rows are shuffled on ``w``
    ONCE and each row leaves the window with its df attached — where the
    groupBy(w)+join-back form tokenizes the corpus twice and shuffles
    the token table twice (once to build the df table, once to join it).
    idf = ln((N+1)/(df+1)); N arrives as a broadcast 1-row aggregate (no
    driver-side count, plan stays lazy).  Rounded to 4 dp so
    double-summation order cannot flip the oracle hash.  (The DuckDB
    oracle keeps the df-table join formulation — an independent plan for
    the same definition.)
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    ).distinct()
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    with_df = tok.withColumn("df", F.count("*").over(Window.partitionBy("w")))
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
    return (
        with_df.crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_distinct_tokens"),
            F.round(F.avg(idf), 4).alias("mean_idf"),
        )
        .orderBy("doc_id")
    )


@_register_standalone(
    "prep_split_assign",
    f"""SELECT doc_id,
              CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8)) AS BIGINT)
                % 100 AS bucket,
              CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8)) AS BIGINT)
                        % 100 < {TRAIN_PCT} THEN 'train'
                   WHEN CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8)) AS BIGINT)
                        % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
                   ELSE 'test' END AS split
       FROM documents ORDER BY doc_id""",
)
def prep_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by content-id hash.

    ``bucket = int(md5(doc_id)[:8], 16) % 100`` — stable across re-runs,
    backfills, and engines (md5 is the only cross-engine hash; never use
    rand() or monotonically_increasing_id for splits).  No shuffle: the
    assignment is a projection, so it composes with any downstream
    partitioning for free.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            bucket.alias("bucket"),
            F.when(bucket < TRAIN_PCT, "train")
            .when(bucket < TRAIN_PCT + VAL_PCT, "val")
            .otherwise("test")
            .alias("split"),
        )
        .orderBy("doc_id")
    )


@_register(
    "prep_pack_sequences",
    f"""WITH sized AS (
         SELECT doc_id,
                doc_id % {PACK_SHARDS} AS shard,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         FROM documents
       )
       SELECT doc_id, shard, n_tokens,
              CAST(COALESCE(SUM(n_tokens) OVER (
                     PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   // {PACK_BUDGET_TOKENS} AS BIGINT) AS pack_id
       FROM sized ORDER BY doc_id""",
)
def prep_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget sequence packing (concat-then-chunk).

    Documents are sharded by id, ordered within the shard, and assigned
    ``pack_id = tokens_before_me // BUDGET`` via a running-sum window —
    the standard streaming approximation of bin packing used when
    assembling fixed-length pre-training sequences.  One shuffle (the
    shard hash); window state is O(1) per row.  Shard count scales with
    the cluster so no shard outgrows an executor.
    """
    sized = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return sized.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(before / PACK_BUDGET_TOKENS).cast("bigint").alias("pack_id"),
    ).orderBy("doc_id")


def _sample_bucket_sql() -> str:
    return (
        "CAST(('0x' || substr(md5(source || ':' || CAST(doc_id AS STRING)), 1, 8))"
        " AS BIGINT) % 1000"
    )


@_register_standalone(
    "prep_sample_stratified",
    f"""SELECT doc_id, source FROM documents
       WHERE {_sample_bucket_sql()} < {SAMPLE_PER_MILLE}
       ORDER BY doc_id""",
)
def prep_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: ~10% per source stratum.

    keep ⇔ ``int(md5(source:doc_id)[:8], 16) % 1000 < 100``.  Unlike
    ``df.sample()`` this is reproducible across runs, engines, and
    repartitions, composes with incremental loads (a document's fate
    never changes), and samples every stratum at the same rate without a
    per-stratum pass.  Pure projection+filter — no shuffle, no state.
    """
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    return (
        load_table(spark, sf_dir, "documents")
        .filter(bucket < SAMPLE_PER_MILLE)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def _split_bucket_sql() -> str:
    return (
        "CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8)) AS BIGINT) % 100"
    )


@_register(
    "prep_decontaminate",
    f"""WITH grams AS (
         SELECT doc_id,
                {_split_bucket_sql()} AS bucket,
                unnest(CASE WHEN len(string_split(text, ' ')) >= {DECON_NGRAM}
                       THEN list_distinct(list_transform(
                              range(1, len(string_split(text, ' ')) - {DECON_NGRAM - 2}),
                              i -> array_to_string(
                                     string_split(text, ' ')[i:i+{DECON_NGRAM - 1}], ' ')))
                       ELSE [] END) AS g
         FROM documents
       ),
       train AS (SELECT doc_id, g FROM grams WHERE bucket < {TRAIN_PCT}),
       test  AS (SELECT doc_id, g FROM grams WHERE bucket >= {TRAIN_PCT + VAL_PCT})
       SELECT t.doc_id,
              CAST(COUNT(DISTINCT x.doc_id) AS BIGINT) AS n_test_docs_hit
       FROM train t JOIN test x ON x.g = t.g
       GROUP BY t.doc_id
       ORDER BY t.doc_id""",
)
def prep_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: train docs sharing any long n-gram with
    the held-out test split.

    The standard pre-training hygiene pass: {DECON_NGRAM}-gram exact
    overlap (long n-grams are rare by construction, so the inverted-index
    join stays sparse — the reason production decontamination uses 8-13
    grams, not shingle-width ones).  Splits come from the same
    deterministic md5 bucketing as prep_split_assign, so the check is
    stable across runs.  Scale shape: explode distinct n-grams → hash
    join train-side × (tiny) test-side → distinct-count per train doc;
    the test side of the join broadcasts at any corpus size where the
    held-out set is benchmark-sized.
    """
    # fan_scan: the long-n-gram explode dominates (measured 0.48x)
    docs = load_table(spark, sf_dir, "documents", fan_scan=True)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    toks = docs.select(
        "doc_id", bucket.alias("bucket"), F.split(F.col("text"), " ").alias("t")
    ).filter(F.size("t") >= DECON_NGRAM)
    gram_parts = ", ".join(f"t[i+{k}]" for k in range(DECON_NGRAM))
    grams = toks.select(
        "doc_id",
        "bucket",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(0, size(t)-{DECON_NGRAM}),"
                    f" i -> concat_ws(' ', {gram_parts}))"
                )
            )
        ).alias("g"),
    )
    train = grams.filter(F.col("bucket") < TRAIN_PCT).select("doc_id", "g")
    test = grams.filter(F.col("bucket") >= TRAIN_PCT + VAL_PCT).select(
        F.col("doc_id").alias("test_doc"), "g"
    )
    # No static broadcast hint: the test split is 1% OF THE CORPUS, so its
    # exploded 8-gram table grows with the data — at 100 TB it is far past
    # any broadcast limit and a forced hint would OOM the driver.  AQE
    # sees the runtime size and still broadcasts whenever it genuinely
    # fits (it does at every fixture SF).
    #
    # Measured negative result (r5): folding the self-join into ONE
    # groupBy(g) with split-conditional collect_sets (one tokenize, one
    # shuffle) is 1.46× SLOWER at sf0.1 under identical load — collect_set
    # exits whole-stage codegen into ObjectHashAggregate, and that
    # per-gram object overhead costs more than the join form's second
    # tokenize+shuffle.  Keep the codegen-friendly join.
    return (
        train.join(test, "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("test_doc").cast("bigint").alias("n_test_docs_hit"))
        .orderBy("doc_id")
    )


@_register_standalone(
    "prep_length_deciles",
    """SELECT doc_id, source,
              round(PERCENT_RANK() OVER w, 6) AS len_pctile,
              CAST(NTILE(10) OVER w AS BIGINT) AS decile,
              CASE WHEN PERCENT_RANK() OVER w BETWEEN 0.05 AND 0.95
                   THEN 'keep' ELSE 'clip' END AS length_filter
       FROM documents
       WINDOW w AS (PARTITION BY source ORDER BY n_chars, doc_id)
       ORDER BY doc_id""",
)
def prep_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length-distribution position: percentile rank, decile,
    and the tail-clipping verdict (drop the shortest/longest 5% within
    each source) — the standard outlier-length filter computed per
    stratum so verbose sources don't swallow terse ones.

    percent_rank is an exact rational ((rank-1)/(n-1)) and ntile's
    remainder rule is pinned by the SQL standard, so both engines agree
    bit-for-bit given the deterministic (n_chars, doc_id) tiebreak.
    One shuffle on source; window state is O(1) per row.
    """
    return length_deciles_frame(load_table(spark, sf_dir, "documents"))


def length_filter_arm(meta: DataFrame) -> DataFrame:
    """(doc_id, length_filter) — exactly the clip verdict of
    :func:`length_deciles_frame` (same window spec, same band) without
    its pctile/decile columns or terminal sort, so composed consumers
    (the curate verdict) shuffle only (doc_id, source, n_chars) through
    the per-source window instead of re-sorting a full signal frame
    (r14, composed-pipeline constant)."""
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    pr = F.percent_rank().over(w)
    return meta.select(
        "doc_id",
        F.when((pr >= 0.05) & (pr <= 0.95), "keep")
        .otherwise("clip")
        .alias("length_filter"),
    )


def length_deciles_frame(meta: DataFrame) -> DataFrame:
    """Frame core of ``prep_length_deciles`` over any (doc_id, source,
    n_chars) frame — the per-source percentile band is GLOBAL state, so
    the incremental corpus build recomputes it from its maintained
    per-doc metadata (an integer window, never a raw-text pass)."""
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    pr = F.percent_rank().over(w)
    return (
        meta.select(
            "doc_id",
            "source",
            F.round(pr, 6).alias("len_pctile"),
            F.ntile(10).over(w).cast("bigint").alias("decile"),
            F.when((pr >= 0.05) & (pr <= 0.95), "keep")
            .otherwise("clip")
            .alias("length_filter"),
        )
        .orderBy("doc_id")
    )


_PACKS_SQL = f"""
WITH sized AS (
  SELECT doc_id,
         doc_id % {PACK_SHARDS} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
assigned AS (
  SELECT doc_id, shard, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
                PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              // {PACK_BUDGET_TOKENS} AS BIGINT) AS pack_id
  FROM sized
)
SELECT a.shard, a.pack_id,
       string_agg(d.text, ' <eos> ' ORDER BY a.doc_id) AS packed_text,
       CAST(SUM(a.n_tokens) AS BIGINT) AS pack_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM assigned a JOIN documents d USING (doc_id)
GROUP BY a.shard, a.pack_id
ORDER BY a.shard, a.pack_id"""


@_register_standalone("prep_materialize_packs", _PACKS_SQL)
def prep_materialize_packs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracled standalone form of :func:`materialize_packs` (default EOS):
    the packed TEXT itself — member docs concatenated in doc_id order —
    is cross-engine checked byte-for-byte via DuckDB's ordered
    string_agg, not just the assignment (which `prep_pack_sequences`
    already certifies)."""
    return (
        materialize_packs(spark, sf_dir)
        .select(
            "shard",
            "pack_id",
            "packed_text",
            F.col("pack_tokens").cast("bigint").alias("pack_tokens"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
        )
        .orderBy("shard", "pack_id")
    )


def materialize_packs(
    spark: SparkSession, sf_dir: str, eos: str = " <eos> "
) -> DataFrame:
    """Materialize the packed training sequences themselves: one row per
    (shard, pack_id) with the member documents concatenated in doc_id
    order, EOS-separated — the artifact a training loader actually reads,
    downstream of ``prep_pack_sequences``'s assignment.

    Scale shape: ONE shuffle (the same shard hash the assignment used) —
    members are collected per pack and ordered inside the array
    (``array_sort`` on (doc_id, text) structs, deterministic without a
    sort exchange), then flattened to text.  Pack sizes are bounded by
    the token budget, so no collect_list outgrows an executor.
    """
    assigned = prep_pack_sequences(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    member = F.array_sort(
        F.collect_list(F.struct(F.col("doc_id"), F.col("text")))
    )
    return (
        assigned.join(docs, "doc_id")
        .groupBy("shard", "pack_id")
        .agg(
            member.alias("_m"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
            F.count("*").alias("n_docs"),
        )
        .select(
            "shard",
            "pack_id",
            F.concat_ws(
                eos, F.expr("transform(_m, x -> x.text)")
            ).alias("packed_text"),
            "pack_tokens",
            "n_docs",
        )
    )


# --------------------------------------------------------------------------
# Consolidated driver certs (one correctness row each; the standalone
# operator forms above stay callable for pipeline use + local tests)
# --------------------------------------------------------------------------

@_register(
    "prep_doc_scores",
    f"""WITH bg AS (
         SELECT doc_id, unnest(list_transform(
                  range(1, greatest(len(string_split(text, ' ')), 2)),
                  i -> string_split(text, ' ')[i] || ' ' ||
                       string_split(text, ' ')[i+1])) AS b
         FROM documents
         WHERE len(string_split(text, ' ')) >= 2
       ),
       per AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
       rep AS (
         SELECT doc_id, MAX(c) AS top_bigram_count, SUM(c) AS n_bigrams
         FROM per GROUP BY doc_id
       ),
       tok AS (
         SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS w
         FROM documents
       ),
       nn AS (SELECT COUNT(*) AS n_docs FROM documents),
       dfreq AS (SELECT w, COUNT(*) AS df FROM tok GROUP BY w),
       idf AS (
         SELECT t.doc_id,
                CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
                round(AVG(ln((nn.n_docs + 1.0) / (f.df + 1.0))), 4) AS mean_idf
         FROM tok t CROSS JOIN nn JOIN dfreq f ON f.w = t.w
         GROUP BY t.doc_id
       ),
       dec AS (
         SELECT doc_id, source,
                round(PERCENT_RANK() OVER w, 6) AS len_pctile,
                CAST(NTILE(10) OVER w AS BIGINT) AS decile,
                CASE WHEN PERCENT_RANK() OVER w BETWEEN 0.05 AND 0.95
                     THEN 'keep' ELSE 'clip' END AS length_filter
         FROM documents
         WINDOW w AS (PARTITION BY source ORDER BY n_chars, doc_id)
       )
       SELECT d.doc_id, dec.source,
              CAST(COALESCE(r.top_bigram_count, 0) AS BIGINT) AS top_bigram_count,
              CAST(COALESCE(r.n_bigrams, 0) AS BIGINT) AS n_bigrams,
              round(CASE WHEN r.n_bigrams > 0
                         THEN CAST(r.top_bigram_count AS DOUBLE) / r.n_bigrams
                         ELSE 0.0 END, 6) AS top_bigram_frac,
              i.n_distinct_tokens, i.mean_idf,
              dec.len_pctile, dec.decile, dec.length_filter
       FROM documents d
       LEFT JOIN rep r ON r.doc_id = d.doc_id
       JOIN idf i ON i.doc_id = d.doc_id
       JOIN dec ON dec.doc_id = d.doc_id
       ORDER BY d.doc_id""",
)
def prep_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three per-document quality scores in one frame: repetition
    (top-bigram fraction), corpus rarity (mean IDF), and per-source length
    position (percentile / decile / clip verdict) — the columns a corpus
    build's filter stage actually consumes together.

    Consolidated cert for prep_repetition + prep_idf_rarity +
    prep_length_deciles (each remains callable standalone above).  The
    doc_id joins add nothing at scale: every side is already keyed and
    sized by doc_id, and AQE picks broadcast-vs-shuffle per side.
    """
    rep = prep_repetition(spark, sf_dir)
    idf = prep_idf_rarity(spark, sf_dir)
    dec = prep_length_deciles(spark, sf_dir)
    return (
        rep.join(idf, "doc_id")
        .join(dec, "doc_id")
        .select(
            "doc_id",
            "source",
            "top_bigram_count",
            "n_bigrams",
            "top_bigram_frac",
            "n_distinct_tokens",
            "mean_idf",
            "len_pctile",
            "decile",
            "length_filter",
        )
        .orderBy("doc_id")
    )


@_register(
    "prep_split_sample",
    f"""SELECT doc_id, source,
              CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8)) AS BIGINT)
                % 100 AS bucket,
              CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8)) AS BIGINT)
                        % 100 < {TRAIN_PCT} THEN 'train'
                   WHEN CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8)) AS BIGINT)
                        % 100 < {TRAIN_PCT + VAL_PCT} THEN 'val'
                   ELSE 'test' END AS split,
              CAST(CASE WHEN {_sample_bucket_sql()} < {SAMPLE_PER_MILLE}
                        THEN 1 ELSE 0 END AS BIGINT) AS sampled
       FROM documents ORDER BY doc_id""",
)
def prep_split_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic split assignment + stratified-sample verdict per
    document (consolidated cert for prep_split_assign +
    prep_sample_stratified; the filter form is the flag form + WHERE).
    Both are md5-bucket projections — no shuffle, stable across re-runs,
    engines, and repartitions.
    """
    split_bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    sample_bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            split_bucket.alias("bucket"),
            F.when(split_bucket < TRAIN_PCT, "train")
            .when(split_bucket < TRAIN_PCT + VAL_PCT, "val")
            .otherwise("test")
            .alias("split"),
            F.when(sample_bucket < SAMPLE_PER_MILLE, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("sampled"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Document chunking (sliding window) — round 3
# --------------------------------------------------------------------------

CHUNK_CHARS, CHUNK_STRIDE = 200, 150  # 50-char overlap between neighbours
DOMAIN_CAP = 10  # per-source quota for the capped-mix cert

_CHUNK_SQL = f"""
SELECT doc_id,
       CAST(t.s / {CHUNK_STRIDE} AS INT) AS chunk_idx,
       CAST(t.s AS BIGINT) AS chunk_start,
       CAST(len(substr(text, CAST(t.s AS INT) + 1, {CHUNK_CHARS})) AS BIGINT)
         AS chunk_len,
       md5(substr(text, CAST(t.s AS INT) + 1, {CHUNK_CHARS})) AS chunk_md5
FROM documents,
     LATERAL (SELECT unnest(range(0, greatest(len(text), 1), {CHUNK_STRIDE}))
              AS s) t
ORDER BY doc_id, chunk_idx
"""


@_register("prep_chunk_docs", _CHUNK_SQL)
def prep_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (size 200 chars, stride 150).

    The context-window prep step: long documents become overlapping
    fixed-size chunks; each chunk carries its start offset and an md5
    content fingerprint (the terminal stays canon-safe — downstream
    pipelines substring the text again or keep the chunk column, both
    map-only).  Chunk starts come from ``sequence(0, len-1, stride)`` —
    a per-row generator, no shuffle at all: the whole operator is one
    narrow map stage, which is the correct 100 TB shape (chunking 100 TB
    is embarrassingly parallel; the only cost is the write).

    Empty documents produce one empty chunk (offset 0) so every doc_id
    survives into the chunked corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    starts = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(F.length("text") - 1, F.lit(0)),
            F.lit(CHUNK_STRIDE),
        )
    ).alias("s")
    chunk = F.expr(f"substring(text, s + 1, {CHUNK_CHARS})")
    return (
        docs.select("doc_id", "text", starts)
        .select(
            "doc_id",
            (F.col("s") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
            F.col("s").cast("bigint").alias("chunk_start"),
            F.length(chunk).cast("bigint").alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


# --------------------------------------------------------------------------
# Domain capping / target-mix resampling — round 3
# --------------------------------------------------------------------------

_DOMAIN_CAP_SQL = f"""
WITH r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT doc_id, source, CAST(rk AS BIGINT) AS src_rank,
       CAST(CASE WHEN rk <= {DOMAIN_CAP} THEN 1 ELSE 0 END AS INT) AS kept
FROM r ORDER BY doc_id
"""


@_register("prep_domain_cap", _DOMAIN_CAP_SQL)
def prep_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota cap: keep a deterministic pseudo-random sample of
    at most DOMAIN_CAP documents per source.

    The over-represented-domain guard every corpus mix applies (cap
    boilerplate-heavy domains before weighting the rest).  Ordering by
    ``md5(doc_id)`` inside each source makes the quota a uniform sample
    that is stable across runs, engines, and partitionings — never
    ``rand()``.  One shuffle on source (the ranking window); the window
    is rank-only so it streams without buffering whole partitions.
    """
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", rk.alias("rk"))
        .select(
            "doc_id",
            "source",
            F.col("rk").cast("bigint").alias("src_rank"),
            F.when(F.col("rk") <= DOMAIN_CAP, 1)
            .otherwise(0)
            .cast("int")
            .alias("kept"),
        )
        .orderBy("doc_id")
    )


#: Default target mix for the oracled standalone form: weights are exact
#: binary fractions already summing to 1, so the Python-side
#: normalization (w / total_w) and the SQL literals are bit-identical
#: doubles and quota arithmetic (n/w division, floor(w*t_max)) agrees
#: across engines at any scale factor.
MIX_TARGETS: dict[str, float] = {"src0": 0.5, "src1": 0.25, "src2": 0.25}


@_register_standalone(
    "prep_mix_to_targets",
    f"""WITH tgt(source, w) AS (VALUES {", ".join(f"('{s}', {w})" for s, w in MIX_TARGETS.items())}),
       counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
       sized AS (SELECT c.source, c.n, t.w FROM counts c JOIN tgt t USING (source)),
       bound AS (SELECT MIN(n / w) AS t_max FROM sized),
       quota AS (SELECT source, FLOOR(w * t_max) AS quota
                 FROM sized CROSS JOIN bound),
       rk AS (
         SELECT doc_id, source,
                ROW_NUMBER() OVER (
                  PARTITION BY source
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS src_rank
         FROM documents
       )
       SELECT r.doc_id, r.source, CAST(r.src_rank AS BIGINT) AS src_rank
       FROM rk r JOIN quota q USING (source)
       WHERE r.src_rank <= q.quota
       ORDER BY r.doc_id""",
)
def prep_mix_to_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracled standalone form of :func:`mix_to_targets` with a pinned
    target mix: 50/25/25 over the first three fixture sources (all other
    sources drop).  md5-first ranking is deterministic, so the DuckDB
    twin reproduces the exact kept set and ranks — the resampler's full
    verdict is cross-engine checked, not just its row count."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        mix_to_targets(docs, dict(MIX_TARGETS))
        .select("doc_id", "source", F.col("src_rank").cast("bigint").alias("src_rank"))
        .orderBy("doc_id")
    )


def mix_to_targets(docs: DataFrame, targets: dict[str, float]) -> DataFrame:
    """Resample a corpus to a target per-source mix, keeping as much data
    as the targets allow.

    Given relative weights ``targets[source] = w`` (sources absent from
    the dict are dropped), the achievable corpus size is
    ``T = min_s(count_s / w_norm_s)`` — the most constrained source
    binds.  Each source then keeps its ``floor(w_norm_s * T)``
    md5-first-ranked documents, so re-runs keep identical rows.

    Distributed shape: per-source counts are an aggregate over ≤|sources|
    groups; the quota table is tiny and joins back broadcast-style (AQE
    decides — no static hint, source cardinality is data-dependent).  The
    only data-sized shuffle is the ranking window on source.
    """
    spark = docs.sparkSession
    total_w = sum(targets.values())
    tgt = spark.createDataFrame(
        [(s, w / total_w) for s, w in targets.items()], "source string, w double"
    )
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    sized = counts.join(tgt, "source")  # inner: drops non-target sources
    t_bound = sized.agg(
        F.min(F.col("n") / F.col("w")).alias("t_max")
    )
    quota = sized.crossJoin(t_bound).select(
        "source", F.floor(F.col("w") * F.col("t_max")).alias("quota")
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    return (
        docs.join(quota, "source")
        .select("doc_id", "source", rk.alias("src_rank"), "quota")
        .filter(F.col("src_rank") <= F.col("quota"))
        .select("doc_id", "source", "src_rank")
    )


# --------------------------------------------------------------------------
# Deterministic exact-k-per-group sampling (fixed-size dev sets)
# --------------------------------------------------------------------------

EXACT_K_PER_SOURCE = 5
_EXACT_K_SALT_BUCKETS = 32


def _hash_rank_sql() -> str:
    # deterministic per-doc draw: first 8 md5 hex chars as an integer —
    # same idiom as the rate-based sampler, so selections never depend
    # on run order or partitioning
    return (
        "CAST(('0x' || substr(md5('k:' || source || ':' || CAST(doc_id AS STRING)),"
        " 1, 8)) AS BIGINT)"
    )


@_register_standalone(
    "prep_sample_exact_k",
    f"""SELECT doc_id, source,
              CAST(ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY {_hash_rank_sql()}, doc_id)
                   AS BIGINT) AS rk
       FROM documents
       QUALIFY rk <= {EXACT_K_PER_SOURCE}
       ORDER BY source, rk""",
)
def prep_sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-source deterministic sample (the fixed-size dev-set
    draw the rate-based ``prep_sample_stratified`` cannot give: a rate
    yields a BINOMIAL count per group; evals need exactly k).

    The draw orders each group by a content-derived hash (uniform over
    docs, stable across runs/partitionings) and keeps the first k —
    uniform sampling without replacement, no rand() anywhere.

    Scale shape: a single window over ``partitionBy(source)`` funnels
    each source onto ONE reducer — the low-cardinality hot-key trap the
    z-score operator documents.  This implementation is the two-phase
    top-k instead: phase 1 ranks within (source, salt-bucket) — |src|·32
    balanced partitions — and keeps k per bucket (any group's true
    top-k survives: each candidate beats every discarded row of its own
    bucket); phase 2 re-ranks the ≤ |src|·32·k survivors, a frame small
    enough that its single-reducer-per-source window is free.  The
    DuckDB oracle runs the straightforward one-window form — an
    independent plan arriving at the identical selection.
    """
    hr = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("k:"),
                    F.col("source"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", hr.alias("hr")
    )
    salted = docs.withColumn(
        "salt", (F.col("doc_id") % _EXACT_K_SALT_BUCKETS)
    )
    w1 = Window.partitionBy("source", "salt").orderBy("hr", "doc_id")
    survivors = (
        salted.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= EXACT_K_PER_SOURCE)
    )
    w2 = Window.partitionBy("source").orderBy("hr", "doc_id")
    return (
        survivors.withColumn("rk", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rk") <= EXACT_K_PER_SOURCE)
        .select("doc_id", "source", "rk")
        .orderBy("source", "rk")
    )


# --------------------------------------------------------------------------
# weighted sampling WITHOUT replacement — integer-exact systematic form
# --------------------------------------------------------------------------

#: systematic-sample size: small enough that every SF has more docs than
#: draws, large enough that heavy docs earn multiple draws at sf0.001.
WEIGHTED_SAMPLE_K = 50

_WEIGHTED_SAMPLE_SQL = f"""
WITH ordered AS (
  SELECT doc_id, n_chars AS w,
         COALESCE(SUM(n_chars) OVER (
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
         SUM(n_chars) OVER () AS total_w
  FROM documents
)
SELECT doc_id, w,
       ((({WEIGHTED_SAMPLE_K} * (cum_before + w)) - 1) // total_w)
         - (({WEIGHTED_SAMPLE_K} * cum_before + total_w - 1) // total_w) + 1
         AS n_draws
FROM ordered
WHERE ((({WEIGHTED_SAMPLE_K} * (cum_before + w)) - 1) // total_w)
      >= (({WEIGHTED_SAMPLE_K} * cum_before + total_w - 1) // total_w)
ORDER BY doc_id
"""


@_register_standalone("prep_sample_weighted", _WEIGHTED_SAMPLE_SQL)
def prep_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, probability ∝ ``n_chars``
    — the "sample training docs by length/quality score" primitive —
    as DETERMINISTIC systematic sampling (the particle-filter /
    SUS form) made integer-exact for the cross-engine oracle.

    Shape: order docs by the md5 permutation (stable, engine-neutral),
    take the running weight sum, and select every doc whose cumulative
    interval ``[cum_before, cum_before + w)`` covers a grid point
    ``j·W/k`` (j = 0..k-1, W = total weight, k = {WEIGHTED_SAMPLE_K}).
    Each grid point lands in exactly one interval, so at most k distinct
    docs are drawn, inclusion probability is proportional to weight, and
    a doc heavier than ``W/k`` is drawn once with ``n_draws > 1`` (its
    importance-weighting multiplicity) — exactly the without-replacement
    semantics sequence-mixing wants.  The float-free selection test is
    pure BIGINT: interval covers a grid point ⇔
    ``floor((k·cum_after − 1)/W) ≥ ceil(k·cum_before/W)`` — both engines
    compute identical integers (non-negative operands, so Spark's
    truncating ``div`` and DuckDB's flooring ``//`` agree), closing the
    ln/pow ULP hazard an Efraimidis-Spirakis key ordering would carry
    through the oracle hash.

    Scale: ONE global running-sum window is the textbook caveat — at
    100 TB replace the single ORDER BY with the two-phase form (cumsum
    within hash buckets + broadcast per-bucket offsets, the
    ``prep_sample_exact_k`` discipline); k·W fits BIGINT to ~9·10¹⁸, past
    which the grid arithmetic moves to DECIMAL(38,0) unchanged.
    """
    w_ord = Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    cum_before = F.coalesce(
        F.sum("w").over(w_ord.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    total_w = F.sum("w").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ordered = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.col("n_chars").alias("w"))
        .withColumn("cum_before", cum_before)
        .withColumn("total_w", total_w)
    )
    # integer floor-division: expr('a div b') truncates; operands are
    # non-negative so truncation == floor on both engines
    lo_i = F.expr(
        f"({WEIGHTED_SAMPLE_K} * cum_before + total_w - 1) div total_w"
    )
    hi_i = F.expr(
        f"({WEIGHTED_SAMPLE_K} * (cum_before + w) - 1) div total_w"
    )
    return (
        ordered.withColumn("n_draws", (hi_i - lo_i + 1).cast("bigint"))
        .filter(hi_i >= lo_i)
        .select("doc_id", "w", "n_draws")
        .orderBy("doc_id")
    )


# --- deterministic epoch shuffle (sharded) ----------------------------------
#
# Training loaders need a DIFFERENT global permutation of the corpus each
# epoch, reproducible from (seed, epoch) alone.  The scalable form is the
# one production data loaders actually consume: a deterministic SHARD
# assignment plus a deterministic order WITHIN each shard — the writer
# emits one file set per shard, the loader reads shards in order.  A
# single global ROW_NUMBER would funnel the corpus through one window
# partition; sharding keeps every stage fully distributed (the window
# partitions by shard), and the (shard, pos) pair still defines a total
# order = one global permutation per epoch.
#
# Reference behavior anchored: the reference returns rows in whatever
# order Postgres yields (src/repositories/*.py add ORDER BY id) — epoch
# randomization is a training-pipeline extension with no reference
# counterpart beyond "deterministic given the same inputs".

EPOCH_SHARDS = 8
EPOCH_SEED = "ep7"


def _epoch_hash_sql(seed: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{seed}:' || CAST(doc_id AS STRING)),"
        " 1, 15)) AS BIGINT)"
    )


@_register_standalone(
    "prep_epoch_shuffle",
    f"""WITH h AS (
         SELECT doc_id, {_epoch_hash_sql(EPOCH_SEED)} AS eh FROM documents
       )
       SELECT doc_id,
              CAST(eh % {EPOCH_SHARDS} AS BIGINT) AS shard,
              CAST(ROW_NUMBER() OVER (PARTITION BY eh % {EPOCH_SHARDS}
                                      ORDER BY eh, doc_id) - 1
                   AS BIGINT) AS pos
       FROM h
       ORDER BY shard, pos""",
)
def prep_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-``EPOCH_SEED`` permutation of the documents table — the
    registry cert for :func:`epoch_shuffle`."""
    docs = load_table(spark, sf_dir, "documents")
    return epoch_shuffle(docs, EPOCH_SEED).orderBy("shard", "pos")


def epoch_shuffle(
    docs: DataFrame, seed: str, shards: int = EPOCH_SHARDS
) -> DataFrame:
    """Deterministic epoch permutation as (doc_id, shard, pos): shard =
    seeded md5 mod ``shards``, pos = hash order within the shard.

    Changing the seed string reshuffles everything; the same seed always
    reproduces the same permutation regardless of partitioning or run
    order (content-derived hash, full doc_id tiebreak).  Scale shape:
    one uniform hash shuffle onto shards + per-shard sort — no global
    single-partition window; shard count scales with the cluster.
    """
    eh = F.expr(
        f"cast(conv(substring(md5(concat('{seed}:',"
        " cast(doc_id as string))), 1, 15), 16, 10) as bigint)"
    )
    w = Window.partitionBy(F.col("eh") % shards).orderBy("eh", "doc_id")
    return docs.select("doc_id", eh.alias("eh")).select(
        "doc_id",
        (F.col("eh") % shards).cast("bigint").alias("shard"),
        (F.row_number().over(w) - 1).cast("bigint").alias("pos"),
    )


# --- span-level decontamination ---------------------------------------------
#
# ``prep_decontaminate`` (above) FLAGS train documents sharing any long
# n-gram with the held-out split — the drop-the-doc policy.  This
# operator locates the contaminated SPANS themselves (gaps-and-islands
# over the positions of test-overlapping n-grams, the same maximal-run
# reconstruction as dedup_substring_spans), so the pipeline can cut the
# leaked benchmark passage and KEEP the document — the remediation
# production pipelines actually apply when contamination is a quoted
# snippet inside an otherwise-good document.
#
# Scale shape: the test split is a fixed small fraction (1%), so its
# distinct-gram table is the small side of one hash semi-join against
# the train gram stream; the island window partitions by doc.  Same
# three uniform shuffles as the dedup span operator.

DECON_SPAN_NGRAM = 8  # = DECON_NGRAM; repeated literally in both texts


@_register_standalone(
    "prep_decontaminate_spans",
    f"""WITH toks AS (
         SELECT doc_id, {_split_bucket_sql()} AS bucket,
                string_split(lower(text), ' ') AS t
         FROM documents
       ),
       g AS (
         SELECT doc_id, bucket,
                unnest(range(1, len(t) - {DECON_SPAN_NGRAM - 2})) AS pos1,
                unnest(list_transform(
                  range(1, len(t) - {DECON_SPAN_NGRAM - 2}),
                  i -> CAST(('0x' || substr(md5(
                         array_to_string(t[i:i+{DECON_SPAN_NGRAM - 1}], ' ')),
                         1, 15)) AS BIGINT))) AS g
         FROM toks WHERE len(t) >= {DECON_SPAN_NGRAM}
       ),
       testg AS (
         SELECT DISTINCT g FROM g WHERE bucket >= {TRAIN_PCT + VAL_PCT}
       ),
       hits AS (
         SELECT a.doc_id, a.pos1 FROM g a JOIN testg USING (g)
         WHERE a.bucket < {TRAIN_PCT}
       ),
       isl AS (
         SELECT doc_id, pos1,
                pos1 - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos1)
                  AS grp
         FROM hits
       )
       SELECT doc_id, CAST(MIN(pos1) - 1 AS BIGINT) AS span_start,
              CAST(MAX(pos1) - MIN(pos1) + {DECON_SPAN_NGRAM} AS BIGINT)
                AS span_len
       FROM isl GROUP BY doc_id, grp
       ORDER BY doc_id, span_start""",
)
def prep_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal test-set-overlapping spans inside train documents:
    (doc_id, span_start, span_len), 0-based token offsets — the
    cut-instead-of-drop upgrade of ``prep_decontaminate``."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    toks = (
        # fan_scan REMOVED: 0.90x in the isolated interleaved A/B but
        # 1.6-4x SLOWER and unstable (2.9-5.8 s across all 5 runs) in
        # full-sweep context vs a rock-solid 0.90 s unfanned - sweep
        # evidence outranks the isolated pair (BENCH_LOCAL history)
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            bucket.alias("bucket"),
            F.split(F.lower(F.col("text")), " ").alias("t"),
        )
        .filter(F.size("t") >= DECON_SPAN_NGRAM)
    )
    gram = f"concat_ws(' ', slice(t, i+1, {DECON_SPAN_NGRAM}))"
    grams = toks.select(
        "doc_id",
        "bucket",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(t)-{DECON_SPAN_NGRAM}),"
                f" i -> struct(i as pos, cast(conv(substring(md5({gram}),"
                f" 1, 15), 16, 10) as bigint) as g))"
            )
        ).alias("pg"),
    ).select("doc_id", "bucket", F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))
    testg = (
        grams.filter(F.col("bucket") >= TRAIN_PCT + VAL_PCT)
        .select("g")
        .distinct()
    )
    hits = (
        grams.filter(F.col("bucket") < TRAIN_PCT)
        .join(testg, "g")
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") - F.min("pos") + F.lit(DECON_SPAN_NGRAM))
            .cast("bigint")
            .alias("span_len"),
        )
        .select("doc_id", "span_start", "span_len")
        .orderBy("doc_id", "span_start")
    )


# --- temperature-scaled source mixing (T = 0.5) ------------------------------
#
# Multilingual / multi-domain pre-training rebalances sources by
# count^T (XLM-R §3.1, mT5: T in [0.2, 0.7] upsamples rare sources and
# downsamples head sources).  This is the T = 0.5 pass in fully integer
# arithmetic: weights are EXACT integer square roots of the per-source
# counts, so the cert has no float terminal and no pow() cross-engine
# risk.  floor(sqrt(double)) alone can be off by one ulp near perfect
# squares (probed: 999999999999999999 → 1000000000 instead of
# 999999999), so both engines apply the ±1 correction that makes the
# result exactly math.isqrt — the same belt-and-braces discipline as
# the histogram module's integer edges.


def _isqrt_sql(n: str) -> str:
    """Exact integer sqrt of a BIGINT expression, portable to both
    engines: float sqrt as a fast guess, then a ±1 integer correction
    (error of floor(sqrt(double)) is at most 1 for n < 2^63)."""
    base = f"CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT)"
    return (
        f"({base} + (CASE WHEN ({base}+1)*({base}+1) <= {n} THEN 1 ELSE 0 END)"
        f" - (CASE WHEN {base}*{base} > {n} THEN 1 ELSE 0 END))"
    )


def mix_temperature(docs: DataFrame) -> DataFrame:
    """Resample to the T = 0.5 source mix → (doc_id, source, src_rank).

    Integer plan: per-source weights w_s = isqrt(n_s); the achievable
    total is T = min_s floor(n_s·W / w_s) (the most constrained source
    binds — for T < 1 that is always the LARGEST source, the opposite
    of mix_to_targets' fixed-dict case); each source keeps its
    floor(w_s·T / W) md5-first-ranked docs (≤ n_s by construction).
    Products stay in BIGINT range: n_s·W < 2^63 for any corpus where
    n_s < 1e12 and Σ isqrt(n_s) < 1e6 — i.e. far past 100 TB of docs.

    Distributed shape: counts/weights/quota are ≤|sources| rows (one
    tiny aggregate + broadcast-back joins); the only data-sized work is
    the per-source ranking window, identical to mix_to_targets.
    """
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    weights = counts.withColumn("w", F.expr(_isqrt_sql("n")))
    wsum = weights.agg(F.sum("w").cast("bigint").alias("w_total"))
    t_bound = (
        weights.crossJoin(F.broadcast(wsum))
        .select(F.expr("(n * w_total) div w").alias("t_cap"))
        .agg(F.min("t_cap").alias("t_all"))
    )
    quota = (
        weights.crossJoin(F.broadcast(wsum))
        .crossJoin(F.broadcast(t_bound))
        .select("source", F.expr("(w * t_all) div w_total").alias("quota"))
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    return (
        docs.join(quota, "source")
        .select("doc_id", "source", rk.alias("src_rank"), "quota")
        .filter(F.col("src_rank") <= F.col("quota"))
        .select("doc_id", "source", F.col("src_rank").cast("bigint").alias("src_rank"))
        .orderBy("doc_id")
    )


# The fixture's 20 sources are UNIFORM (the mix would be a no-op and the
# cert trivial), so the registered form first derives a deterministically
# SKEWED sub-corpus — per-source keep rate 5%·rank(source) via the usual
# md5 bucket — and rebalances that.  Same planting technique as the PII
# cert: both engines share the construction verbatim.
_MIX_SKEW_SQL = """skewed AS (
  SELECT d.doc_id, d.source
  FROM documents d
  JOIN (SELECT source,
               ROW_NUMBER() OVER (ORDER BY source) AS si
        FROM (SELECT DISTINCT source FROM documents)) s USING (source)
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          % 100 < 5 * si
)"""

_MIX_TEMP_SQL = f"""WITH {_MIX_SKEW_SQL},
counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM skewed GROUP BY source
),
weights AS (SELECT source, n, {_isqrt_sql('n')} AS w FROM counts),
wsum AS (SELECT CAST(SUM(w) AS BIGINT) AS w_total FROM weights),
bound AS (SELECT MIN((n * w_total) // w) AS t_all FROM weights CROSS JOIN wsum),
quota AS (
  SELECT source, (w * t_all) // w_total AS quota
  FROM weights CROSS JOIN wsum CROSS JOIN bound
),
rk AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS src_rank
  FROM skewed
)
SELECT r.doc_id, r.source, CAST(r.src_rank AS BIGINT) AS src_rank
FROM rk r JOIN quota q USING (source)
WHERE r.src_rank <= q.quota
ORDER BY r.doc_id"""


@_register_standalone("prep_mix_temperature", _MIX_TEMP_SQL)
def prep_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T = 0.5 temperature-rebalanced corpus (the XLM-R mixing pass) over
    the deterministically skewed fixture sub-corpus (see _MIX_SKEW_SQL —
    the raw fixture's sources are uniform, which would certify nothing)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    si = F.row_number().over(Window.orderBy("source"))  # ≤20 distinct sources
    srcs = docs.select("source").distinct().withColumn("si", si)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    skewed = docs.join(srcs, "source").filter(bucket < 5 * F.col("si")).select(
        "doc_id", "source"
    )
    return mix_temperature(skewed)


# --- DSIR: data selection via importance resampling ---------------------------
#
# The published pre-training data-selection recipe (Xie et al., "Data
# Selection for Language Models via Importance Resampling", NeurIPS
# 2023): score every raw document by the log-likelihood ratio of its
# hashed n-gram features under a TARGET distribution (here: the corpus's
# English slice — DSIR's canonical "formal text" target) vs the SOURCE
# distribution (the whole corpus), then keep/resample toward positive
# ratios.  Feature space is hashed word-bigram buckets, so both
# distributions are one bounded histogram each regardless of corpus
# size.
#
# Integer-exactness discipline (the text_lm_surprisal pattern): the
# per-bucket log-ratio log2(p_t(b)/p_s(b)) with add-one smoothing is
# quantized to WHOLE BITS in pure BIGINT arithmetic —
# a = (ct+1)·(Ts+NB), c = (cs+1)·(Tt+NB), λ = ±(length(bin(max/min))−1)
# — so both engines agree bit-for-bit with no libm risk.  A production
# deployment wanting fractional bits swaps the terminal for double
# log2() over the same exact counts.  Scale note: the BIGINT products
# hold to ~10^9-gram corpora per side; past that, swap to the double
# terminal (the counts pipeline is unchanged).

#: hashed-bigram feature buckets (DSIR uses 10^4-10^5 at web scale; the
#: fixture vocabulary saturates far below this)
DSIR_BUCKETS = 1024

_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
grams AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT)
           % {DSIR_BUCKETS} AS b
  FROM (
    SELECT doc_id, lang,
           unnest(list_transform(range(1, len(t)),
                                 i -> t[i] || ' ' || t[i + 1])) AS g
    FROM toks
  )
),
doc_b AS (SELECT doc_id, b, COUNT(*) AS k FROM grams GROUP BY doc_id, b),
src AS (SELECT b, COUNT(*) AS cs FROM grams GROUP BY b),
tgt AS (SELECT b, COUNT(*) AS ct FROM grams WHERE lang = 'en' GROUP BY b),
tot AS (
  SELECT (SELECT COUNT(*) FROM grams) AS ts,
         (SELECT COUNT(*) FROM grams WHERE lang = 'en') AS tt
),
lam AS (
  SELECT s.b,
         CASE WHEN (COALESCE(ct, 0) + 1) * (ts + {DSIR_BUCKETS})
                   >= (cs + 1) * (tt + {DSIR_BUCKETS})
              THEN CAST(length(bin(
                     ((COALESCE(ct, 0) + 1) * (ts + {DSIR_BUCKETS}))
                     // ((cs + 1) * (tt + {DSIR_BUCKETS})))) AS BIGINT) - 1
              ELSE 1 - CAST(length(bin(
                     ((cs + 1) * (tt + {DSIR_BUCKETS}))
                     // ((COALESCE(ct, 0) + 1) * (ts + {DSIR_BUCKETS})))) AS BIGINT)
         END AS lam
  FROM src s LEFT JOIN tgt USING (b) CROSS JOIN tot
),
scored AS (
  SELECT d.doc_id, SUM(d.k) AS n_grams, SUM(d.k * l.lam) AS w_bits
  FROM doc_b d JOIN lam l USING (b)
  GROUP BY d.doc_id
)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(w_bits AS BIGINT) AS w_bits,
       CAST((1000 * w_bits) // n_grams AS BIGINT) AS rate_mbits,
       (1000 * w_bits) // n_grams > 0 AS target_like
FROM scored ORDER BY doc_id"""


def _dsir_grams(d: DataFrame, *cols: str) -> DataFrame:
    """(``*cols``, b): one row per word-bigram occurrence, hashed into
    DSIR_BUCKETS md5 buckets (cross-engine arithmetic)."""
    toks = d.select(*cols, F.split("text", " ").alias("t")).filter(
        F.size("t") >= 2
    )
    g = toks.select(
        *cols,
        F.explode(
            F.expr("transform(sequence(0, size(t)-2),"
                   " i -> concat(t[i], ' ', t[i+1]))")
        ).alias("g"),
    )
    b = (
        F.conv(F.substring(F.md5(F.col("g")), 1, 8), 16, 10).cast("bigint")
        % DSIR_BUCKETS
    )
    return g.select(*cols, b.alias("b"))


def _dsir_lambda(src: DataFrame, tgt: DataFrame, ts: int, tt: int) -> DataFrame:
    """(b, lam): whole-bit log2 likelihood ratio per bucket from the
    (b, cs) / (b, ct) histograms and their totals — pure BIGINT."""
    a = f"(coalesce(ct, CAST(0 AS BIGINT)) + 1) * ({ts} + {DSIR_BUCKETS})"
    c = f"(cs + 1) * ({tt} + {DSIR_BUCKETS})"
    return src.join(tgt, "b", "left").select(
        "b",
        F.expr(
            f"CASE WHEN {a} >= {c}"
            f" THEN CAST(length(bin(({a}) div ({c}))) AS BIGINT) - 1"
            f" ELSE 1 - CAST(length(bin(({c}) div ({a}))) AS BIGINT) END"
        ).alias("lam"),
    )


def _dsir_score(doc_b: DataFrame, lam: DataFrame) -> DataFrame:
    """Per-doc weight rows from the per-doc bucket histogram × the
    broadcast λ table."""
    scored = (
        doc_b.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_grams"),
            F.sum(F.col("k") * F.col("lam")).cast("bigint").alias("w_bits"),
        )
    )
    rate = F.expr("(1000 * w_bits) div n_grams").cast("bigint")
    return scored.select(
        "doc_id",
        "n_grams",
        "w_bits",
        rate.alias("rate_mbits"),
        (rate > 0).alias("target_like"),
    ).orderBy("doc_id")


def dsir_weights(docs: DataFrame, target: DataFrame) -> DataFrame:
    """Per-document DSIR importance weights of ``docs`` (doc_id, text)
    toward the n-gram distribution of ``target`` (text) — see the
    module-block note for the method and the integer-bits terminal.

    Scale shape: one corpus pass builds the per-doc bucket histogram
    (map-side combined groupBy); source/target histograms and the
    λ table are ≤ DSIR_BUCKETS rows (broadcast); the scoring join is
    per-doc-bucket × broadcast λ.  No shuffle grows past the corpus's
    own bucket rows.

    The gram totals the λ table needs are ``sum(k)`` over the very
    histograms it is built from, so ONE job materializes both sides'
    (side, b, k) rows (≤ 2·DSIR_BUCKETS, control-plane-bounded — the
    `_pca_partials` one-scan precedent) and the totals fall out in
    Python; the r9 form paid two EXTRA full gram passes via standalone
    ``.count()`` actions on src_g/tgt_g.
    """
    spark = docs.sparkSession
    rows = _dsir_state(docs, target).collect()
    src_rows = [(r["b"], r["k"]) for r in rows if r["side"] == "src"]
    tgt_rows = [(r["b"], r["k"]) for r in rows if r["side"] == "tgt"]
    src = local_df(spark, src_rows, "b bigint, cs bigint")
    tgt = local_df(spark, tgt_rows, "b bigint, ct bigint")
    ts = sum(k for _, k in src_rows)
    tt = sum(k for _, k in tgt_rows)
    lam = _dsir_lambda(src, tgt, ts, tt)
    doc_b = (
        _dsir_grams(docs, "doc_id")
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("k"))
    )
    return _dsir_score(doc_b, lam)


def dsir_weights_tagged(docs: DataFrame, target_flag: str) -> DataFrame:
    """:func:`dsir_weights` for the common target-is-a-flagged-subset
    case (``docs`` carries a boolean ``target_flag`` column): bit-equal
    to ``dsir_weights(docs.select('doc_id','text'),
    docs.filter(target_flag).select('text'))`` — the histograms are
    integer occurrence counts either way — in ONE gram pass instead of
    two (r14, guide §2.3/§1.2: don't recompute what a pass already
    carries).

    The per-doc bucket histogram is built once and checkpointed (it is
    doc×bucket-bounded — the k-compressed form both the state and the
    scoring join need); BOTH side histograms then fall out of a tiny
    aggregation over it (the flag is functional on doc_id, so grouping
    by it changes no counts), and the scoring join reuses the same
    checkpointed table.  The r13 form exploded the corpus grams twice —
    once for the (side, b, k) state, once for the per-doc scoring
    histogram."""
    spark = docs.sparkSession
    doc_b = (
        _dsir_grams(docs, "doc_id", target_flag)
        .groupBy("doc_id", target_flag, "b")
        .agg(F.count("*").alias("k"))
        .localCheckpoint(eager=True)
    )
    rows = (
        doc_b.groupBy("b")
        .agg(
            F.sum("k").alias("cs"),
            F.sum(F.when(F.col(target_flag), F.col("k"))).alias("ct"),
        )
        .collect()
    )
    src_rows = [(r["b"], r["cs"]) for r in rows]
    tgt_rows = [(r["b"], r["ct"]) for r in rows if r["ct"] is not None]
    src = local_df(spark, src_rows, "b bigint, cs bigint")
    tgt = local_df(spark, tgt_rows, "b bigint, ct bigint")
    ts = sum(k for _, k in src_rows)
    tt = sum(k for _, k in tgt_rows)
    lam = _dsir_lambda(src, tgt, ts, tt)
    return _dsir_score(doc_b.select("doc_id", "b", "k"), lam)


# --- incremental DSIR state maintenance ---------------------------------------
#
# The source/target bucket histograms are MERGEABLE sufficient
# statistics on INTEGER counts: state(corpus ∪ batch) = state(corpus) +
# state(batch), exactly — unlike the float Gram partials of pca_state
# there is no merge-order ulp caveat at all, so maintained ≡ rebuilt is
# bit-equality, not tolerance.  Both histograms live in ONE table
# ((side, b, k) rows) so the state publishes atomically, and appends
# ride the shared exactly-once protocol (streaming/txn.py).

DSIR_STATE_TABLE = "dsir_state"


def _dsir_state(docs: DataFrame, target: DataFrame) -> DataFrame:
    """(side, b, k) encoded histograms of one corpus/batch: 'src' = all
    of ``docs``, 'tgt' = ``target``."""
    src = (
        _dsir_grams(docs.select("text"))
        .groupBy("b")
        .agg(F.count("*").alias("k"))
        .select(F.lit("src").alias("side"), "b", "k")
    )
    tgt = (
        _dsir_grams(target.select("text"))
        .groupBy("b")
        .agg(F.count("*").alias("k"))
        .select(F.lit("tgt").alias("side"), "b", "k")
    )
    return src.unionByName(tgt)


def build_dsir_state(wh, docs: DataFrame, target: DataFrame) -> None:
    """Materialize the DSIR distributions for a corpus + target slice."""
    wh.publish(
        {DSIR_STATE_TABLE: wh.stage(DSIR_STATE_TABLE, _dsir_state(docs, target))}
    )


def append_to_dsir_state(
    wh, docs_batch: DataFrame, target_batch: DataFrame, batch_id: int | None = None
) -> None:
    """Absorb a corpus batch (and its target-slice subset) into the
    persisted DSIR distributions.  A state never built reads EMPTY, so
    the first append IS the build.  ``batch_id`` opts into the shared
    exactly-once protocol (re-delivered ids rejected; a crash before
    the marker re-runs from the intent-pinned base version)."""
    from data_ingestion_backend_spark.streaming import txn

    base = wh.current_version(DSIR_STATE_TABLE)
    if batch_id is not None:
        if batch_id <= txn.last_batch(wh, DSIR_STATE_TABLE):
            return
        bases = txn.begin_batch(
            wh,
            DSIR_STATE_TABLE,
            batch_id,
            {"state": base},
            tables={"state": DSIR_STATE_TABLE},
        )
        base = bases["state"]
    merged = (
        wh.read(DSIR_STATE_TABLE, base)
        .unionByName(_dsir_state(docs_batch, target_batch))
        .groupBy("side", "b")
        .agg(F.sum("k").cast("bigint").alias("k"))
    )
    wh.publish({DSIR_STATE_TABLE: wh.stage(DSIR_STATE_TABLE, merged)})
    if batch_id is not None:
        txn.commit_batch(wh, DSIR_STATE_TABLE, batch_id)


def dsir_weights_from_state(wh, docs: DataFrame) -> DataFrame:
    """Score ANY (doc_id, text) frame against the MAINTAINED
    distributions — zero scans of the historical corpus; bit-equal to
    :func:`dsir_weights` over the same accumulated inputs (integer
    histograms merge exactly)."""
    state = wh.read(DSIR_STATE_TABLE)
    src = state.filter(F.col("side") == "src").select(
        "b", F.col("k").alias("cs")
    )
    tgt = state.filter(F.col("side") == "tgt").select(
        "b", F.col("k").alias("ct")
    )
    totals = {
        r["side"]: r["t"]
        for r in state.groupBy("side").agg(F.sum("k").alias("t")).collect()
    }
    lam = _dsir_lambda(
        src, tgt, int(totals.get("src", 0)), int(totals.get("tgt", 0))
    )
    doc_b = (
        _dsir_grams(docs, "doc_id")
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("k"))
    )
    return _dsir_score(doc_b, lam)


@_register_standalone("prep_dsir_weights", _DSIR_SQL)
def prep_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights of every document toward the corpus's
    English slice (the target distribution)."""
    # fan_scan measured NEUTRAL-to-negative on a drift-controlled
    # interleaved A/B (1.17x) — the n-gram pass win seen under
    # contention does not hold on a quiet host; native split kept
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    # single-gram-pass tagged form (bit-equal; see dsir_weights_tagged)
    return dsir_weights_tagged(
        docs.select(
            "doc_id", (F.col("lang") == "en").alias("is_tgt"), "text"
        ),
        "is_tgt",
    )


# --- token-budget selection ---------------------------------------------------
#
# The curation end-game: given a per-document integer quality score and
# a corpus token budget, keep the greedy quality-ranked prefix — docs in
# (score DESC, doc_id ASC) order while cumulative tokens fit.  This is
# how a fixed-size pre-training mix is actually cut from a scored pool
# (C4/FineWeb-style: score, sort, take until the budget).
#
# Scale shape — NO global ordered window over the corpus (the classic
# single-partition trap for running sums): the cumulative structure is
# decomposed into (a) a SCORE-LEVEL histogram (≤ |distinct scores| rows —
# the only unpartitioned window runs over this bounded table), and (b) a
# per-score running sum (window PARTITIONED by score, ordered by doc_id)
# that settles the boundary score exactly.  selected(d) =
# tokens_before_score(d) + running_tokens_within_score(d) ≤ budget —
# pure BIGINT, the exact greedy prefix, engine-identical.
#
# Prefix semantics (documented, certified): a doc that would overflow
# the budget is excluded AND blocks later docs in the order — no
# best-fit skipping (skipping reorders quality, which curation does not
# want).

#: budget as a percentage of total corpus tokens
BUDGET_PCT = 60

_BUDGET_SQL = f"""
WITH d AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS score
  FROM documents
),
tot AS (SELECT SUM(n_tokens) * {BUDGET_PCT} // 100 AS budget FROM d),
hist AS (SELECT score, SUM(n_tokens) AS st FROM d GROUP BY score),
cum AS (
  SELECT score,
         SUM(st) OVER (ORDER BY score DESC
                       ROWS UNBOUNDED PRECEDING) - st AS before_tokens
  FROM hist
),
within AS (
  SELECT doc_id, score, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY score ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_in_score
  FROM d
)
SELECT w.doc_id,
       CAST(w.score AS BIGINT) AS score,
       CAST(w.n_tokens AS BIGINT) AS n_tokens,
       c.before_tokens + w.cum_in_score <= t.budget AS selected
FROM within w JOIN cum c USING (score) CROSS JOIN tot t
ORDER BY w.doc_id"""


def token_budget_select(
    scored: DataFrame, budget_tokens: int
) -> DataFrame:
    """Greedy quality-prefix selection: ``scored`` carries (doc_id,
    score BIGINT, n_tokens BIGINT); returns the same rows plus
    ``selected`` — true for the (score DESC, doc_id ASC)-ordered prefix
    whose cumulative token count fits ``budget_tokens``.

    PRECONDITION — score domain ≪ corpus: the unpartitioned window and
    the ``broadcast(cum)`` below are bounded by |distinct scores|, NOT
    the corpus, and that is the whole scale argument.  A fine-grained
    score whose cardinality approaches the doc count (raw DSIR
    rate_mbits, per-token LM bits) degrades this to a single-partition
    sort plus an unbounded broadcast — coarsen such scores first
    (e.g. ``F.expr("score div 10")``, or a quantile bucket) so the
    level count stays in the thousands; the greedy cut then operates on
    quality TIERS, which is how production mixes are actually specified.
    """
    hist = scored.groupBy("score").agg(F.sum("n_tokens").alias("st"))
    # score-level table: ≤ |distinct scores| rows — the unpartitioned
    # window is bounded by the score domain, never the corpus
    w_scores = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "score", (F.sum("st").over(w_scores) - F.col("st")).alias("before_tokens")
    )
    w_in = (
        Window.partitionBy("score")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("cum_in_score", F.sum("n_tokens").over(w_in))
        .join(F.broadcast(cum), "score")
        .select(
            "doc_id",
            F.col("score").cast("bigint").alias("score"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            (
                F.col("before_tokens") + F.col("cum_in_score")
                <= F.lit(int(budget_tokens))
            ).alias("selected"),
        )
        .orderBy("doc_id")
    )


@_register_standalone("prep_token_budget_select", _BUDGET_SQL)
def prep_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{BUDGET_PCT}%-of-corpus token-budget cut, quality = distinct-token
    richness (swap in any integer score — DSIR rate, LM bits, curate
    verdicts — without touching the shape)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("bigint")
        .alias("score"),
    )
    budget = d.agg(
        F.expr(f"sum(n_tokens) * {BUDGET_PCT} div 100")
    ).collect()[0][0]
    return token_budget_select(d, int(budget))


# --- leakage-free split (near-dup clusters never straddle splits) ------------
#
# Hash-splitting DOCUMENTS leaks: a near-duplicate pair split across
# train and test puts (effectively) test data in the training set, and
# benchmark contamination studies trace exactly this path.  The fix is
# to split by NEAR-DUP CLUSTER — the same md5-bucket assignment as
# ``prep_split_assign``, keyed by the MinHash-CC cluster id instead of
# the doc id, so every cluster lands whole on one side.  Singleton docs
# (cluster_id = doc_id) get the identical assignment the doc-level
# split would give them — the two splits differ ONLY where leakage
# would have occurred (asserted by golden).


def split_leakage_free(labels: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, bucket, split) from a (doc_id, cluster_id)
    label frame — md5-bucket assignment on the CLUSTER id."""
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return labels.select(
        "doc_id",
        "cluster_id",
        bucket.alias("bucket"),
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    ).orderBy("doc_id")


def _leakfree_sql() -> str:
    from data_ingestion_backend_spark.operators.dedup import _minhash_ctes

    b = (
        "CAST(('0x' || substr(md5(CAST(cluster_id AS STRING)), 1, 8))"
        " AS BIGINT) % 100"
    )
    return f"""WITH RECURSIVE {_minhash_ctes()},
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
      labels AS (SELECT id AS doc_id, MIN(lbl) AS cluster_id
                 FROM reach GROUP BY id)
      SELECT doc_id, cluster_id,
             {b} AS bucket,
             CASE WHEN {b} < {TRAIN_PCT} THEN 'train'
                  WHEN {b} < {TRAIN_PCT + VAL_PCT} THEN 'val'
                  ELSE 'test' END AS split
      FROM labels ORDER BY doc_id"""


@_register_standalone("prep_split_leakage_free", _leakfree_sql())
def prep_split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-keyed train/val/test assignment over the documents
    fixture — near-dup clusters never straddle a split boundary."""
    from data_ingestion_backend_spark.operators.dedup import dedup_clusters

    labels = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    return split_leakage_free(labels)
