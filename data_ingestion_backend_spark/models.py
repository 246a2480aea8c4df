"""Canonical table schemas and enums of the ingestion pipeline.

Re-expresses the reference's five Postgres tables (reference
``src/models/job.py:20-38``, ``src/models/issue.py:28-87``,
``src/models/contact.py:11-29``) as explicit Spark StructTypes over
parquet.  Ids are content-derived or dense (never
``monotonically_increasing_id`` — oracle-visible ids must be
deterministic); enums are plain strings validated with ``isin``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- enums (reference src/models/job.py:11-17, src/models/issue.py:12-25) ---

class JobStatus:
    PENDING = "PENDING"
    PROCESSING = "PROCESSING"
    NEEDS_REVIEW = "NEEDS_REVIEW"
    COMPLETED = "COMPLETED"
    FAILED = "FAILED"
    ALL = (PENDING, PROCESSING, NEEDS_REVIEW, COMPLETED, FAILED)
    # delete allowed only from these (reference job_repository.py:266-267)
    DELETABLE = (PENDING, NEEDS_REVIEW, FAILED)


class StagingStatus:
    READY = "READY"
    SUCCESS = "SUCCESS"
    DISCARD = "DISCARD"
    ISSUE = "ISSUE"
    ALL = (READY, SUCCESS, DISCARD, ISSUE)


class IssueType:
    DUPLICATE_EMAIL = "DUPLICATE_EMAIL"
    INVALID_EMAIL = "INVALID_EMAIL"
    EXISTING_EMAIL = "EXISTING_EMAIL"
    MISSING_REQUIRED_FIELD = "MISSING_REQUIRED_FIELD"
    ALL = (DUPLICATE_EMAIL, INVALID_EMAIL, EXISTING_EMAIL, MISSING_REQUIRED_FIELD)


# --- canonical CSV row contract (reference csv_validator.py:18-23) ---

CANONICAL_COLUMNS = ("email", "first_name", "last_name", "company")

# normalized-header → canonical-column synonym map.  Keys are passed through
# functions.scalars.norm_header (casefold, strip spaces/underscores/dashes).
HEADER_SYNONYMS: dict[str, str] = {
    # email
    "email": "email",
    "emailaddress": "email",
    # first name (incl. pt-BR synonyms, reference README ADR-004)
    "firstname": "first_name",
    "nome": "first_name",
    "fname": "first_name",
    "givenname": "first_name",
    # last name
    "lastname": "last_name",
    "sobrenome": "last_name",
    "lname": "last_name",
    "surname": "last_name",
    "familyname": "last_name",
    # company
    "company": "company",
    "empresa": "company",
    "organization": "company",
    "org": "company",
    "companyname": "company",
}

# --- table schemas ---

JOBS_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),  # content-derived (file sha256)
        T.StructField("job_user_id", T.LongType(), False),
        T.StructField("job_filename", T.StringType(), False),
        T.StructField("job_status", T.StringType(), False),
        T.StructField("job_total_rows", T.LongType(), False),
        T.StructField("job_processed_rows", T.LongType(), False),
        T.StructField("job_issue_count", T.LongType(), False),
        T.StructField("job_error", T.StringType(), True),
        T.StructField("job_created_at", T.TimestampType(), False),
        T.StructField("job_updated_at", T.TimestampType(), False),
    ]
)

STAGING_SCHEMA = T.StructType(
    [
        T.StructField("staging_id", T.StringType(), False),  # job_id + line_no
        T.StructField("staging_job_id", T.StringType(), False),
        T.StructField("line_no", T.LongType(), False),  # 1-based data-row order
        T.StructField("email", T.StringType(), True),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("last_name", T.StringType(), True),
        T.StructField("company", T.StringType(), True),
        T.StructField("staging_status", T.StringType(), False),
        T.StructField("staging_row_hash", T.StringType(), False),  # idempotency
    ]
)

ISSUES_SCHEMA = T.StructType(
    [
        T.StructField("issue_id", T.StringType(), False),  # job_id|type|key hash
        T.StructField("issues_job_id", T.StringType(), False),
        T.StructField("issue_type", T.StringType(), False),
        T.StructField("issue_key", T.StringType(), True),  # e.g. offending email
        T.StructField("issue_resolved", T.BooleanType(), False),
        T.StructField("resolved_at", T.TimestampType(), True),
        T.StructField("resolved_by", T.StringType(), True),
        T.StructField("issue_created_at", T.TimestampType(), False),
    ]
)

ISSUE_ITEMS_SCHEMA = T.StructType(
    [
        T.StructField("issue_id", T.StringType(), False),
        T.StructField("staging_id", T.StringType(), False),
    ]
)

CONTACTS_SCHEMA = T.StructType(
    [
        T.StructField("contact_id", T.StringType(), False),  # md5(user_id|staging_row_hash)
        T.StructField("contacts_user_id", T.LongType(), False),  # denormalized owner
        T.StructField("email", T.StringType(), False),
        T.StructField("first_name", T.StringType(), False),
        T.StructField("last_name", T.StringType(), False),
        T.StructField("company", T.StringType(), False),
        T.StructField("contact_created_at", T.TimestampType(), False),
    ]
)

#: streaming near-dup gate tables (streaming/neardup.py) — fixed by
#: construction: 16 MinHash signature slots (dedup.MINHASH_COEFFS),
#: the distinct-shingle array used for exact-Jaccard verification, and
#: the verified pair output of ``dedup._verify_jaccard``.  Registered
#: here so a never-seeded warehouse reads an EMPTY corpus (admit
#: everything) rather than raising KeyError('neardup_index').
NEARDUP_INDEX_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType(), True)]
    + [T.StructField(f"m{j}", T.LongType(), True) for j in range(16)]
    + [
        T.StructField("ss", T.ArrayType(T.StringType()), True),
        T.StructField("n", T.LongType(), True),
    ]
)

NEARDUP_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("doc_a", T.LongType(), True),
        T.StructField("doc_b", T.LongType(), True),
        T.StructField("jaccard", T.DoubleType(), True),
    ]
)

NEARDUP_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("band_idx", T.IntegerType(), True),
        T.StructField("band_key", T.StringType(), True),
    ]
)

#: persisted BM25 inverted-index tables (operators/search.py) — fixed by
#: construction: tokenized postings (term frequency per doc) and the
#: INTEGER corpus stats the incremental merge relies on.  Registered so
#: an index-never-built warehouse reads an EMPTY index (zero postings,
#: zero stats rows) rather than raising KeyError('search_postings').
SEARCH_POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("dl", T.IntegerType(), True),
        T.StructField("term", T.StringType(), True),
        T.StructField("tf", T.LongType(), True),
    ]
)

SEARCH_STATS_SCHEMA = T.StructType(
    [
        T.StructField("n_docs", T.LongType(), True),
        T.StructField("sum_dl", T.LongType(), True),
    ]
)

#: persisted PCA sufficient-statistic table (operators/similarity.py):
#: upper-triangle Gram entries as (i, j, g) rows, the per-dimension sum
#: vector as (pos, -1, s) rows, and the corpus count as one (-1, -1, n)
#: row — one table so the whole state publishes in ONE pointer swap.
#: Registered so a state-never-built warehouse reads EMPTY (first append
#: is the build) instead of raising KeyError('pca_state').
PCA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("i", T.LongType(), True),
        T.StructField("j", T.LongType(), True),
        T.StructField("g", T.DoubleType(), True),
    ]
)

#: persisted DSIR sufficient-statistic table (operators/mlprep.py):
#: hashed-bigram bucket counts per distribution side ('src' = the whole
#: corpus, 'tgt' = the target slice) — both histograms are mergeable, so
#: DSIR over a growing corpus is maintained, never rebuilt (the
#: pca_state pattern on integer counts: merges are EXACT, no float
#: drift caveat at all).  Registered so a state-never-built warehouse
#: reads EMPTY (first append is the build).
DSIR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("side", T.StringType(), True),
        T.StructField("b", T.LongType(), True),
        T.StructField("k", T.LongType(), True),
    ]
)

PIPELINE_TABLES = ("jobs", "staging", "issues", "issue_items", "contacts")

#: streaming SEMANTIC admission gate tables (streaming/semgate.py): the
#: cell-assigned embedding index, the verified cosine pair output, and
#: the frozen coarse quantizer.  Registered so a never-seeded warehouse
#: reads an EMPTY corpus (admit everything), same as the neardup tables.
SEMDUP_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("e", T.ArrayType(T.DoubleType()), True),
        T.StructField("cluster", T.LongType(), True),
    ]
)

SEMDUP_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("new_id", T.LongType(), True),
        T.StructField("old_id", T.LongType(), True),
        T.StructField("cosine", T.DoubleType(), True),
    ]
)

SEMDUP_CENTROIDS_SCHEMA = T.StructType(
    [
        T.StructField("cluster", T.LongType(), True),
        T.StructField("centroid", T.ArrayType(T.DoubleType()), True),
    ]
)

ADMISSIONS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("batch_id", T.LongType(), True),
        T.StructField("admitted", T.BooleanType(), True),
        T.StructField("reason", T.StringType(), True),
    ]
)

#: incremental corpus-build state tables (operators/corpus_incremental.py):
#: accumulated raw docs + per-doc static signals, the near-dup signature /
#: band / pair / label state, the span-gram postings + doc-frequency
#: state over SURVIVORS, per-survivor cleaned-token counts and DSIR
#: bucket histograms, and the maintained decision table.  Registered so
#: a build-never-started warehouse reads EMPTY everywhere (the first
#: batch IS the build).
CB_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("n_raw", T.LongType(), True),
        T.StructField("static_ok", T.BooleanType(), True),
    ]
)

CB_LABELS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("lbl", T.LongType(), True),
    ]
)

CB_SURV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("cluster_id", T.LongType(), True),
    ]
)

CB_GRAM_POSTS_SCHEMA = T.StructType(
    [
        T.StructField("g", T.LongType(), True),
        T.StructField("doc_id", T.LongType(), True),
    ]
)

CB_GRAM_DF_SCHEMA = T.StructType(
    [
        T.StructField("g", T.LongType(), True),
        T.StructField("df", T.LongType(), True),
    ]
)

CB_CLEAN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("n_clean", T.LongType(), True),
    ]
)

CB_DOC_BUCKETS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("b", T.LongType(), True),
        T.StructField("k", T.LongType(), True),
    ]
)

CB_DECISIONS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("stage", T.StringType(), True),
        T.StructField("n_tokens_clean", T.LongType(), True),
        T.StructField("score_tier", T.LongType(), True),
        T.StructField("selected", T.BooleanType(), True),
        T.StructField("split", T.StringType(), True),
        T.StructField("pack_id", T.LongType(), True),
    ]
)

#: per-batch decision CHANGE LOG (append-only): one row per doc whose
#: decision row this batch created or flipped, carrying the full new row
#: plus the old stage for audit.  Latest-batch-wins replay over the log
#: reconstructs the decision table exactly (golden-tested) — the CDC
#: product a downstream trainer tails instead of re-reading the table.
CB_CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), True),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("old_stage", T.StringType(), True),
        T.StructField("stage", T.StringType(), True),
        T.StructField("n_tokens_clean", T.LongType(), True),
        T.StructField("score_tier", T.LongType(), True),
        T.StructField("selected", T.BooleanType(), True),
        T.StructField("split", T.StringType(), True),
        T.StructField("pack_id", T.LongType(), True),
    ]
)

#: DSIR source/target bucket histograms of the incremental corpus
#: build, persisted as a mergeable DELTA LOG ((b, cs, ct) partial
#: counts; state = the per-b sums) — ≤ DSIR_BUCKETS rows after folding,
#: the bounded state that replaces the per-batch O(corpus-buckets)
#: aggregation over cb_doc_buckets.
CB_DSIR_HIST_SCHEMA = T.StructType(
    [
        T.StructField("b", T.LongType(), True),
        T.StructField("cs", T.LongType(), True),
        T.StructField("ct", T.LongType(), True),
    ]
)

#: maintained per-doc DSIR rate state (integer sufficient statistics of
#: `_dsir_score`): updated only for docs whose buckets changed and for
#: docs holding a bucket whose whole-bit λ flipped.
CB_RATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("n_grams", T.LongType(), True),
        T.StructField("w_bits", T.LongType(), True),
    ]
)

#: per-source document-length histogram of the incremental corpus build,
#: persisted as a grow-only delta log ((source, n_chars, cnt) partial
#: counts; state = the per-key sums) — the bounded state that replaces
#: the per-batch percent_rank window over every doc's metadata.
CB_LEN_HIST_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
        T.StructField("cnt", T.LongType(), True),
    ]
)

#: per-source keep-band CUT PAIRS: the (n_chars, doc_id) order
#: statistics at the 5th/95th percent_rank boundaries.  With these, the
#: per-doc length filter is a row-local comparison instead of a window,
#: and the docs whose keep status flipped in a batch are exactly those
#: between the old and new cut pairs.
CB_LEN_CUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), True),
        T.StructField("keep_any", T.BooleanType(), True),
        T.StructField("lo_n", T.LongType(), True),
        T.StructField("lo_id", T.LongType(), True),
        T.StructField("hi_n", T.LongType(), True),
        T.StructField("hi_id", T.LongType(), True),
    ]
)

#: score-tier token histogram of the incremental corpus build (delta
#: log; state = per-score sum of survivor tokens) — the bounded state
#: the budget line is computed from, replacing a full aggregation over
#: every survivor per batch.
CB_TIER_HIST_SCHEMA = T.StructType(
    [
        T.StructField("score", T.LongType(), True),
        T.StructField("st", T.LongType(), True),
    ]
)

SCHEMAS = {
    "jobs": JOBS_SCHEMA,
    "admissions": ADMISSIONS_SCHEMA,
    "staging": STAGING_SCHEMA,
    "issues": ISSUES_SCHEMA,
    "issue_items": ISSUE_ITEMS_SCHEMA,
    "contacts": CONTACTS_SCHEMA,
    "neardup_index": NEARDUP_INDEX_SCHEMA,
    "neardup_pairs": NEARDUP_PAIRS_SCHEMA,
    "neardup_bands": NEARDUP_BANDS_SCHEMA,
    "search_postings": SEARCH_POSTINGS_SCHEMA,
    "search_stats": SEARCH_STATS_SCHEMA,
    "pca_state": PCA_STATE_SCHEMA,
    "dsir_state": DSIR_STATE_SCHEMA,
    "semdup_index": SEMDUP_INDEX_SCHEMA,
    "semdup_pairs": SEMDUP_PAIRS_SCHEMA,
    "semdup_centroids": SEMDUP_CENTROIDS_SCHEMA,
    "cb_docs": CB_DOCS_SCHEMA,
    "cb_minhash": NEARDUP_INDEX_SCHEMA,
    "cb_bands": NEARDUP_BANDS_SCHEMA,
    "cb_pairs": NEARDUP_PAIRS_SCHEMA,
    "cb_labels": CB_LABELS_SCHEMA,
    "cb_surv": CB_SURV_SCHEMA,
    "cb_gram_posts": CB_GRAM_POSTS_SCHEMA,
    "cb_gram_df": CB_GRAM_DF_SCHEMA,
    "cb_clean": CB_CLEAN_SCHEMA,
    "cb_doc_buckets": CB_DOC_BUCKETS_SCHEMA,
    "cb_decisions": CB_DECISIONS_SCHEMA,
    "cb_decision_log": CB_CHANGELOG_SCHEMA,
    "cb_dsir_hist": CB_DSIR_HIST_SCHEMA,
    "cb_rate": CB_RATE_SCHEMA,
    "cb_len_hist": CB_LEN_HIST_SCHEMA,
    "cb_len_cut": CB_LEN_CUT_SCHEMA,
    "cb_tier_hist": CB_TIER_HIST_SCHEMA,
    "corpus_pack_members": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("shard", T.LongType(), True),
            T.StructField("pack_id", T.LongType(), True),
            T.StructField("n_tokens", T.LongType(), True),
        ]
    ),
    "corpus_packs_live": T.StructType(
        [
            T.StructField("shard", T.LongType(), True),
            T.StructField("pack_id", T.LongType(), True),
            T.StructField("packed_text", T.StringType(), True),
            T.StructField("pack_tokens", T.LongType(), True),
            T.StructField("n_docs", T.LongType(), True),
        ]
    ),
}
