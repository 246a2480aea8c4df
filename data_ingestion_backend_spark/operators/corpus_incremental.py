"""INCREMENTAL pretraining corpus build: the round-10 capstone
(`operators/corpus.py`) maintained batch by batch instead of re-run from
scratch — the composition of the two round-10 stories (the batch
capstone + the streaming admission gate's maintained-state discipline).

Each arriving (doc_id, lang, source, n_chars, text) batch advances a set
of warehouse state tables and re-emits the SAME decision table
``prep_corpus_e2e`` computes monolithically — bit-equal after every
batch (golden-tested against both the frame-form monolithic build and
the graded fixture cert).  The cost split is the design:

- **raw-text work is DELTA-ONLY.**  Tokenizing, quality/lang/bigram
  signals, shingling + minhash, and span-gram hashing run over the
  BATCH — plus the (small) set of docs whose span-decontamination
  actually changed — never over the accumulated corpus.  At 100 TB the
  raw text IS the 100 TB; these are the passes that cannot re-run per
  batch.
- **integer-state passes are CHANGE-SCOPED over maintained bounded
  state (r13).**  The globally-coupled stages no longer rescan the
  per-doc scalars each batch; each owns a maintained sufficient
  statistic plus an exactly-characterized flip set:
  per-source length percentiles = a length HISTOGRAM (``cb_len_hist``)
  whose 5th/95th order statistics become broadcast CUT PAIRS — the
  per-doc filter is row-local, and the docs whose status flipped are
  exactly those between the old and new pairs; the canonical-keep
  window recomputes only over clusters whose membership or member q_ok
  changed; DSIR λ evaluates in the driver from a ≤DSIR_BUCKETS-row
  histogram (``cb_dsir_hist``) and per-doc rates (``cb_rate``) update
  only for changed docs and whole-bit λ flips (each bucket flips
  O(log corpus) times EVER); the budget line comes from a score-tier
  token histogram (``cb_tier_hist``) with the within-tier cut an order
  statistic of the cut tier alone, selection a row-local cut-pair
  predicate whose flips one selective scan of the stored flags finds;
  pack ids recompute per shard from the first changed contribution
  only.  Exact (the monolithic equality stays bit-level); the residual
  per-batch corpus-proportional terms are a handful of COLUMN-PRUNED
  integer scans (label-member fetch, selective decision scans, the
  length boundary probe) — no window, shuffle, or sort ever spans the
  corpus (measured in the soak arm, tools/corpussoak.py).
- **per-batch WRITES are bounded by what the batch changed, for ALL
  twelve state tables.**  Grow-only tables (docs, signatures, bands,
  pairs, the decision change log, the gram-df delta log) stage as
  file-level appends; mutable per-doc tables (clean counts, DSIR
  buckets, gram postings, labels, survivors, decisions) stage as
  partition deltas over the doc-id buckets the batch actually flipped.
  The gram-df table is kept as a MERGEABLE DELTA LOG ((g, df) partial
  counts, state = sum per g — the LSM shape): its key is a hash with
  no locality, so a partition delta cannot bound it, but the batch's
  delta can and the scheduled compaction (``Warehouse.compact``)
  bounds the read-side file count.  Even the recomputed decision
  table is DIFFED against the pinned base and only flipped buckets
  are written; the flips are simultaneously appended to the change
  log ``cb_decision_log`` (latest-wins replay ≡ table, golden-tested)
  so a downstream consumer can tail changes instead of re-reading.

Why the globals MUST be recomputed: DSIR λ shifts with every gram the
corpus absorbs, the budget line moves with total tokens, a new longest
copy displaces an old cluster canonical, and a batch can flip an old
doc's per-source length percentile — freezing any of them breaks the
monolithic equality silently.  The one genuinely novel delta mechanism
here is SPAN-STATE maintenance: the survivors' span-gram doc
frequencies are maintained as (g, df) counts plus (g, doc_id) postings;
a batch changes an old survivor's cut IFF some gram's repeated-status
(df ≥ 2) flips, and the postings name exactly the docs to re-cut —
everything else keeps its stored n_clean / bucket histogram.

Exactly-once: the admission-gate protocol verbatim — ONE intent record
pins the base versions of all twelve state tables, every computation is
a pure function of (pinned bases, batch), all tables publish in ONE
manifest swap, and the marker commits the batch (re-delivery is a
no-op; a crash anywhere re-runs from the pinned bases).

Reference anchor: the reference re-validates and re-publishes a full
dataset snapshot per job (src/services/csv_processor.py's reprocess
path); this module is that maintenance contract scaled to a corpus
whose full rebuild is the one cost that cannot be paid per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.corpus import (
    CORPUS_DSIR_TIER,
    CORPUS_LOW_TIER,
    corpus_build_frame,
)
from data_ingestion_backend_spark.operators.corpus import _corpus_oracle_sql
from data_ingestion_backend_spark.operators.queries import _register_standalone
from data_ingestion_backend_spark.plans.localtable import local_df
from data_ingestion_backend_spark.operators.curate import (
    KNOWN_LANGS,
    MAX_TOP_BIGRAM_FRAC,
    MIN_QUALITY,
)
from data_ingestion_backend_spark.operators.dedup import (
    _band_table,
    cc_incremental,
    connected_components,
    cut_tokens_by_spans,
    dedup_incremental_pairs,
    minhash_per_doc_frame,
    span_gram_table,
    spans_from_hits,
)
from data_ingestion_backend_spark.operators.mlprep import (
    BUDGET_PCT,
    DSIR_BUCKETS,
    length_deciles_frame,
    PACK_BUDGET_TOKENS,
    PACK_SHARDS,
    _dsir_grams,
    _dsir_score,
    split_leakage_free,
    token_budget_select,
)
from data_ingestion_backend_spark.operators.text import (
    STOPWORDS,
    quality_expr,
)
from data_ingestion_backend_spark.sources.warehouse import Warehouse
from data_ingestion_backend_spark.streaming import txn

CB_DOCS = "cb_docs"
CB_MINHASH = "cb_minhash"
CB_BANDS = "cb_bands"
CB_PAIRS = "cb_pairs"
CB_LABELS = "cb_labels"
CB_SURV = "cb_surv"
CB_GRAM_POSTS = "cb_gram_posts"
CB_GRAM_DF = "cb_gram_df"
CB_CLEAN = "cb_clean"
CB_DOC_BUCKETS = "cb_doc_buckets"
CB_DECISIONS = "cb_decisions"
CB_CHANGELOG = "cb_decision_log"
CB_DSIR_HIST = "cb_dsir_hist"
CB_RATE = "cb_rate"
CB_LEN_HIST = "cb_len_hist"
CB_LEN_CUT = "cb_len_cut"
CB_TIER_HIST = "cb_tier_hist"

_ALL_TABLES = (
    CB_DOCS,
    CB_MINHASH,
    CB_BANDS,
    CB_PAIRS,
    CB_LABELS,
    CB_SURV,
    CB_GRAM_POSTS,
    CB_GRAM_DF,
    CB_CLEAN,
    CB_DOC_BUCKETS,
    CB_DECISIONS,
    CB_CHANGELOG,
    CB_DSIR_HIST,
    CB_RATE,
    CB_LEN_HIST,
    CB_LEN_CUT,
    CB_TIER_HIST,
)

#: decision-table payload columns (everything but doc_id), in schema
#: order — shared by the diff, the change log, and the replay golden.
DECISION_COLS = (
    "stage",
    "n_tokens_clean",
    "score_tier",
    "selected",
    "split",
    "pack_id",
)


#: doc-id range per hive partition of the mutable per-doc state tables
#: (cb_clean, cb_doc_buckets, cb_gram_posts).  RANGE buckets (div, not
#: mod) make arrival-ordered batches touch only the newest bucket(s) on
#: insert, while removals/re-cuts touch exactly their docs' buckets — so
#: `stage_partition_delta` bounds the per-batch WRITE by affected
#: buckets, never the accumulated state (the Delta MERGE shape).
CB_PART_RANGE = 1024


def _pb_col():
    return F.expr(f"doc_id div {CB_PART_RANGE}").cast("bigint")


def _affected_pbs(docs_df) -> list:
    """Distinct partition buckets of a (doc_id, ...) change set — a
    driver-side list bounded by batch size + span-flip fan-out (the
    batch_max_n control-plane-scalar precedent)."""
    return [
        r["pb"]
        for r in docs_df.select(_pb_col().alias("pb")).distinct().collect()
    ]


def _only_pbs(df, pbs: list):
    """Replacement rows for the affected partitions: the merged frame
    filtered to the affected buckets, pb materialized for the writer."""
    out = df.withColumn("pb", _pb_col())
    return out.filter(F.col("pb").isin(pbs)) if pbs else out.limit(0)


def _doc_subset(
    state_df: DataFrame, ids_df: DataFrame, pbs: list | None
) -> DataFrame:
    """Rows of a maintained per-doc state table belonging to a (small)
    doc-id set.  With ``pbs`` (the set's doc-id buckets), the read is
    partition-pruned — mandatory for TEXT-bearing fetches, where a scan
    would re-read corpus text.  With ``pbs=None`` the lookup is a
    broadcast-semi join over the (column-pruned) table scan instead:
    for integer-only state tables the scan is a few bytes per doc and
    skipping the up-front bucket collect saves one driver round-trip
    per lookup — the per-batch job-count floor is the measured constant
    at small batch sizes (SCALE.md §5)."""
    base = state_df
    if pbs is not None and "pb" in base.columns:
        base = base.filter(F.col("pb").isin(pbs)) if pbs else base.limit(0)
    # no static broadcast hint: steady-state id sets are change-sized
    # and AQE picks the broadcast side at runtime, while migration /
    # first-call paths can pass corpus-sized id sets
    return base.drop("pb").join(ids_df, "doc_id")


def _patched_rows_for(
    old_t: DataFrame,
    changed_keys: DataFrame,
    new_rows: DataFrame,
    ids_df: DataFrame,
    pbs: list,
) -> DataFrame:
    """CURRENT rows of a maintained per-doc table for a (small) doc-id
    set: the physically-pruned old partitions minus the batch's changed
    keys, plus the batch's new rows for those ids — a point lookup
    against logical current state that never materializes the table."""
    kept = _doc_subset(old_t, ids_df, pbs).join(
        changed_keys, "doc_id", "left_anti"
    )
    return kept.unionByName(new_rows.join(ids_df, "doc_id"))


def _patched_replacement(
    old_t: DataFrame,
    changed_keys: DataFrame,
    new_rows: DataFrame,
    pbs: list,
) -> DataFrame:
    """Replacement rows for the AFFECTED doc-id buckets of a partition-
    delta write: pruned old partitions, minus the changed keys, plus
    the new rows (already bounded by the change set), pb re-derived for
    the writer.  The r12 form filtered a derived pb column over the
    full merged plan — which cannot partition-prune, so every delta
    write still paid a full-table read; this assembles the same rows
    from the pruned physical partitions instead."""
    base = old_t
    if "pb" in base.columns:
        base = base.filter(F.col("pb").isin(pbs)) if pbs else base.limit(0)
    kept = base.drop("pb").join(changed_keys, "doc_id", "left_anti")
    out = kept.unionByName(new_rows).withColumn("pb", _pb_col())
    return out.filter(F.col("pb").isin(pbs)) if pbs else out.limit(0)


def _lam_py(cs: int, ct: int, ts: int, tt: int) -> int:
    """Driver-side twin of ``mlprep._dsir_lambda``'s per-bucket integer
    arithmetic (golden-pinned equal over a count grid): the whole-bit
    log2 likelihood ratio.  Python ints are exact, so evaluating the
    ≤ DSIR_BUCKETS-row λ table in the driver costs no Spark job — and
    the OLD-vs-NEW λ diff that bounds the per-doc rate updates falls
    out of the same pass."""
    a = (ct + 1) * (ts + DSIR_BUCKETS)
    c = (cs + 1) * (tt + DSIR_BUCKETS)
    if a >= c:
        return (a // c).bit_length() - 1
    return 1 - (c // a).bit_length()


def _lam_map(hist_rows) -> dict[int, int]:
    """λ per bucket from collected (b, cs, ct) histogram rows."""
    ts = sum(r["cs"] for r in hist_rows)
    tt = sum(r["ct"] for r in hist_rows)
    return {
        r["b"]: _lam_py(r["cs"], r["ct"], ts, tt) for r in hist_rows
    }


#: compaction trigger: a maintained table whose current version exceeds
#: this many data files is rewritten into one snapshot after the commit.
#: Each batch adds ≤ 8 files per table (the control-plane write
#: parallelism), so the default fires roughly every 8 absorbed batches
#: per table — reader file counts stay bounded while per-batch writes
#: keep the append economics (soak-measured: tools/corpussoak.py
#: records per-batch max file counts).
COMPACT_MAX_FILES = 64

#: tables whose physical layout is hive-partitioned on the doc-id range
#: bucket — compaction must restate the layout or lose the pruning.
_PARTITIONED_TABLES = frozenset(
    (
        CB_DOCS,
        CB_LABELS,
        CB_SURV,
        CB_GRAM_POSTS,
        CB_CLEAN,
        CB_DOC_BUCKETS,
        CB_DECISIONS,
        CB_RATE,
    )
)


def _gram_df_collapse(df: DataFrame) -> DataFrame:
    """Fold the gram-df delta log to one row per gram on compaction —
    the LSM merge step.  State-invariant: the per-g sum (what
    ``gram_df_state`` reads) is unchanged; netted-out grams drop."""
    return (
        df.groupBy("g")
        .agg(F.sum("df").cast("bigint").alias("df"))
        .filter(F.col("df") != 0)
    )


def _dsir_hist_collapse(df: DataFrame) -> DataFrame:
    """Fold the DSIR histogram delta log to one row per bucket (same
    LSM shape as ``_gram_df_collapse``); buckets whose counts netted
    to zero drop out."""
    return (
        df.groupBy("b")
        .agg(
            F.sum("cs").cast("bigint").alias("cs"),
            F.sum("ct").cast("bigint").alias("ct"),
        )
        .filter((F.col("cs") != 0) | (F.col("ct") != 0))
    )


def _len_hist_collapse(df: DataFrame) -> DataFrame:
    """Fold the per-source length-histogram delta log (same LSM shape)."""
    return (
        df.groupBy("source", "n_chars")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .filter(F.col("cnt") != 0)
    )


def _tier_hist_collapse(df: DataFrame) -> DataFrame:
    """Fold the score-tier token-histogram delta log (same LSM shape)."""
    return (
        df.groupBy("score")
        .agg(F.sum("st").cast("bigint").alias("st"))
        .filter(F.col("st") != 0)
    )


#: delta-LOG tables: compaction must fold the log (the fold needs every
#: delta row, so these keep the full-rewrite path — their folded state
#: is histogram/key-bounded, not batch-count-bounded).
_LOG_TABLE_FOLDS = {
    CB_GRAM_DF: _gram_df_collapse,
    CB_DSIR_HIST: _dsir_hist_collapse,
    CB_LEN_HIST: _len_hist_collapse,
    CB_TIER_HIST: _tier_hist_collapse,
}


def _keep_rank_range(n: int) -> tuple[int, int] | None:
    """The 1-based rank window [r_lo, r_hi] a doc's (n_chars, doc_id)
    rank must fall in to pass the per-source length band — the exact
    integer form of ``percent_rank() ∈ [0.05, 0.95]``.  The comparisons
    replicate Spark's IEEE-double ``(rank-1)/(N-1)`` arithmetic (Python
    floats ARE IEEE doubles), adjusted by local search so no
    floor-rounding edge can disagree with the window.  ``None`` = the
    band is empty (including N == 1, where percent_rank is defined 0
    and 0 >= 0.05 fails — a single-doc source keeps nothing, exactly
    like the window)."""
    if n <= 1:
        return None
    d = n - 1
    r_lo = int(0.05 * d) + 1
    while r_lo <= n and (r_lo - 1) / d < 0.05:
        r_lo += 1
    while r_lo > 1 and (r_lo - 2) / d >= 0.05:
        r_lo -= 1
    r_hi = int(0.95 * d) + 1
    while r_hi >= 1 and (r_hi - 1) / d > 0.95:
        r_hi -= 1
    while r_hi < n and r_hi / d <= 0.95:
        r_hi += 1
    if r_lo > r_hi or r_lo > n or r_hi < 1:
        return None
    return r_lo, r_hi


def _q_ok_from_cuts(docs: DataFrame, cuts: DataFrame) -> DataFrame:
    """(doc_id, q_ok) via the maintained cut pairs: the per-source
    length band reduces to a ROW-LOCAL lexicographic comparison of
    (n_chars, doc_id) against the band's two order statistics — no
    window, no shuffle (r13; replaces ``_q_ok``'s percent_rank pass).
    Equality with the window form is golden-pinned batch by batch
    through the monolithic equality."""
    j = docs.select("doc_id", "source", "n_chars", "static_ok").join(
        F.broadcast(cuts), "source", "left"
    )
    ge_lo = (F.col("n_chars") > F.col("lo_n")) | (
        (F.col("n_chars") == F.col("lo_n"))
        & (F.col("doc_id") >= F.col("lo_id"))
    )
    le_hi = (F.col("n_chars") < F.col("hi_n")) | (
        (F.col("n_chars") == F.col("hi_n"))
        & (F.col("doc_id") <= F.col("hi_id"))
    )
    len_ok = F.coalesce(F.col("keep_any"), F.lit(False)) & ge_lo & le_hi
    return j.select("doc_id", (F.col("static_ok") & len_ok).alias("q_ok"))


def dsir_hist_state(wh: Warehouse, version: int | None = None) -> DataFrame:
    """The build's DSIR source/target bucket histograms — ≤ DSIR_BUCKETS
    (b, cs, ct) rows, the per-b sum over the ``cb_dsir_hist`` delta log.
    This is the maintained BOUNDED state that replaced the per-batch
    O(corpus-buckets) ``cb_doc_buckets`` aggregation (r12 verdict item:
    the integer-state tier's per-batch compute)."""
    return _dsir_hist_collapse(wh.read(CB_DSIR_HIST, version)).filter(
        F.col("cs") > 0
    )


def maintain_corpus_build(
    wh: Warehouse, max_files: int | None = None
) -> list[str]:
    """Scheduled compaction over the build's state tables: rewrite any
    table whose file count outgrew ``max_files``; return the names
    compacted.  Runs after every committed batch (amortized — almost
    always a cheap file-count stat), safe to run any time between
    batches: compaction publishes EQUAL state atomically, so replay
    from a live intent's pinned bases is unaffected (golden:
    compact-under-intent crash heal).

    Each table takes the compaction path matching its write shape, so
    a FIRED compaction's cost is bounded by what actually fragmented —
    never the accumulated table:

    * grow-only flat tables (``cb_docs`` raw text, signatures, bands,
      pairs, the decision change log) → size-tiered small-file merge
      (``compact_smallfiles``): settled files hard-link unread.  A full
      rewrite here would re-pay the whole corpus TEXT every trigger
      interval forever — the exact O(corpus-text)-per-batch term the
      incremental build exists to delete (r12 advice finding);
    * doc-id-bucketed mutable tables → hot-LEAF rewrite
      (``compact_hot_leaves``): only leaves over threshold re-file,
      cold leaves hard-link (inode golden);
    * the gram-df delta LOG → full rewrite with the fold transform
      (the state is a per-g sum over the log; folding must see every
      delta row, and the folded result is corpus-bounded, not
      batch-count-bounded — the one table where a full pass is the
      point)."""
    if max_files is None:
        max_files = COMPACT_MAX_FILES  # module attr: tests tighten it
    done = []
    for t in _ALL_TABLES:
        prev = wh.current_version(t)
        if t in _LOG_TABLE_FOLDS:
            v = wh.compact_if_needed(t, None, max_files, _LOG_TABLE_FOLDS[t])
        elif t in _PARTITIONED_TABLES:
            v = wh.compact_hot_leaves(t, "pb", max_files)
        else:
            v = wh.compact_smallfiles(t, max_files)
        if v is not None:
            done.append(t)
            if t == CB_MINHASH:
                # re-key the pinned max-n sidecar to the compacted
                # version (content equal, version moved) — sidecar hit
                # via prev, so this is itself scan-free
                _write_cb_stats(wh, v, _cb_max_n(wh, wh.read(t, v), prev))
    return done


def last_built_batch(wh: Warehouse) -> int:
    return txn.last_batch(wh, CB_DECISIONS)


def read_decisions(wh: Warehouse, version: int | None = None) -> DataFrame:
    """The decision table in its logical schema — the physical ``pb``
    partition column (the write-bounding doc-id bucket) dropped."""
    return wh.read(CB_DECISIONS, version).drop("pb")


def gram_df_state(wh: Warehouse, version: int | None = None) -> DataFrame:
    """The survivors' span-gram doc frequencies.  ``cb_gram_df`` is
    persisted as a mergeable DELTA LOG — per-batch (g, df) partial
    counts appended file-level, because g is a hash with no bucket
    locality for a partition delta — so the state is the per-g sum
    (grams whose postings all left net to 0 and drop out).  Scheduled
    compaction collapses the log back to one row per g; the sum is
    invariant under it."""
    df = wh.read(CB_GRAM_DF, version)
    return (
        df.groupBy("g")
        .agg(F.sum("df").cast("bigint").alias("df"))
        .filter(F.col("df") > 0)
    )


def _cb_stats_path(wh: Warehouse) -> str:
    import os

    return os.path.join(wh.root, "_cb_minhash_stats")


def _write_cb_stats(wh: Warehouse, version: int, max_n: int) -> None:
    import json

    txn.write_atomic(
        _cb_stats_path(wh), json.dumps({"version": version, "max_n": max_n})
    )


def _cb_max_n(wh: Warehouse, per_doc_corpus: DataFrame, version: int) -> int:
    """Max distinct-shingle count of the accumulated signature table,
    maintained as a PINNED SCALAR (the neardup `_index_max_n` sidecar
    pattern): the value is monotone (signatures only ever accumulate),
    so ``max(prev, batch)`` written at publish replaces what used to be
    an O(corpus) re-scan of cb_minhash on every batch — the last
    per-batch full-state scan in the delta path.  Version-mismatched or
    missing sidecars (legacy warehouse, crash replay pinned behind the
    stats) fall back to the one-off aggregation over the PINNED frame,
    which can never under-estimate precisely because the table is
    grow-only."""
    import json
    import os

    if version < 0:
        return 0
    p = _cb_stats_path(wh)
    if os.path.exists(p):
        with open(p) as f:
            stats = json.loads(f.read())
        if stats.get("version") == version:
            return int(stats["max_n"])
    return per_doc_corpus.agg(F.max("n")).collect()[0][0] or 0


def _static_signals(batch: DataFrame) -> DataFrame:
    """Per-doc signals that never change once computed (pure functions
    of one document's text): raw token count and the static 3/4 of the
    curate keep rule (quality, repetition, language).  The length
    percentile — the corpus-coupled quarter — is recomputed from state
    per batch (see ``_q_ok``).

    The repetition and language components are FUSED into one tagged
    explode + two hash aggregations (r13 job-floor shave): the separate
    ``repetition_frame`` (two shuffles) + ``lang_pred_frame`` (explode +
    broadcast join + shuffle) pipelines cost ~5 stages per batch where
    the fused pass costs 2, and at fixture batch sizes the per-stage
    floor, not the data, is the bill.  The arithmetic replicates both
    frames exactly — same lowercasing, same per-occurrence stopword
    votes, same alphabetical tie-break, same ``round(frac, 6)`` — and
    sits under the graded DuckDB oracles (`prep_corpus_incremental`,
    `prep_corpus_e2e`) that recompute all three signals independently,
    so any drift from the certified forms is a cross-engine hash miss."""
    sig = batch.select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        "text",
        F.size(F.split("text", " ")).cast("bigint").alias("n_raw"),
        (quality_expr() >= MIN_QUALITY).alias("_q"),
    )
    langs = sorted(STOPWORDS)
    pieces = batch.select(
        "doc_id",
        F.explode(
            F.expr(
                "concat("
                " transform(split(lower(text), ' '),"
                "           w -> struct('w' as tag, w as v)),"
                " if(size(split(text, ' ')) >= 2,"
                "    transform(sequence(0, size(split(text, ' ')) - 2),"
                "              i -> struct('b' as tag,"
                "                          concat_ws(' ', split(text, ' ')[i],"
                "                                    split(text, ' ')[i+1]) as v)),"
                "    cast(array() as array<struct<tag:string,v:string>>)))"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.tag").alias("tag"), F.col("p.v").alias("v"))
    counts = pieces.groupBy("doc_id", "tag", "v").agg(
        F.count("*").alias("c")
    )
    agg = counts.groupBy("doc_id").agg(
        F.max(F.when(F.col("tag") == "b", F.col("c"))).alias("_top"),
        F.sum(
            F.when(F.col("tag") == "b", F.col("c")).otherwise(F.lit(0))
        ).alias("_nb"),
        *[
            F.sum(
                F.when(
                    (F.col("tag") == "w") & F.col("v").isin(*STOPWORDS[lg]),
                    F.col("c"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias(f"h_{lg}")
            for lg in langs
        ],
    )
    best_hits = F.greatest(*[F.col(f"h_{lg}") for lg in langs])
    best_lang = F.lit("und")
    for lg in reversed(langs):  # first lang alphabetically wins ties
        best_lang = F.when(F.col(f"h_{lg}") == best_hits, lg).otherwise(
            best_lang
        )
    frac = F.when(
        F.col("_nb") > 0,
        F.coalesce("_top", F.lit(0)).cast("double") / F.col("_nb"),
    ).otherwise(0.0)
    feats = agg.select(
        "doc_id",
        (F.round(frac, 6) <= MAX_TOP_BIGRAM_FRAC).alias("_r"),
        F.when(best_hits > 0, best_lang)
        .otherwise(F.lit("und"))
        .isin(*KNOWN_LANGS)
        .alias("_l"),
    )
    return sig.join(feats, "doc_id", "left").select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        "text",
        "n_raw",
        (
            F.col("_q")
            & F.coalesce("_r", F.lit(True))
            & F.coalesce("_l", F.lit(False))
        ).alias("static_ok"),
    )


def _q_ok(docs_all: DataFrame) -> DataFrame:
    """(doc_id, q_ok) the MONOLITHIC way — static signal AND the
    per-source length band via the full percent_rank window.  Since r13
    this is the comparator/bootstrap path only: the incremental build
    evaluates the band row-locally against its maintained cut pairs
    (``_q_ok_from_cuts``), and the monolithic equality goldens diff the
    two strategies batch by batch."""
    lf = length_deciles_frame(
        docs_all.select("doc_id", "source", "n_chars")
    ).select("doc_id", (F.col("length_filter") == "keep").alias("_len_ok"))
    return docs_all.select("doc_id", "static_ok").join(lf, "doc_id").select(
        "doc_id", (F.col("static_ok") & F.col("_len_ok")).alias("q_ok")
    )


def _survivors(
    docs_all: DataFrame, q_ok: DataFrame, labels: DataFrame
) -> DataFrame:
    """Quality-aware canonical keep — the corpus_build_frame stage-2
    window verbatim: among q_ok members of each near-dup cluster, the
    longest raw copy wins, ties to the lower id."""
    w_keep = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_raw"), F.asc("doc_id")
    )
    return (
        q_ok.filter("q_ok")
        .join(labels.select("doc_id", F.col("lbl").alias("cluster_id")), "doc_id")
        .join(docs_all.select("doc_id", "n_raw"), "doc_id")
        .withColumn("rn", F.row_number().over(w_keep))
        .filter(F.col("rn") == 1)
        .select("doc_id", "cluster_id")
    )


#: Optional per-stage wall-clock collector for ``extend_corpus_build``:
#: ``tools/corpussoak.py --arm build --decompose`` points this at a dict
#: and each labeled EAGER checkpoint adds elapsed-since-previous-lap
#: seconds under its label (the publish lap closes the batch).  Because
#: every stage boundary is an eager localCheckpoint, lap wall-clock ≈
#: that stage's cost; lazy driver-side work between laps (the max_n / λ
#: scalar collects) rolls into the following lap — documented
#: attribution, good to the second.  None (the default) is zero-cost.
STAGE_CLOCK: dict[str, float] | None = None
_LAP_T0: list[float] = [0.0]

#: When True (default), a set STAGE_CLOCK also makes every stage
#: boundary EAGER — per-stage attribution at the cost of one blocking
#: job per boundary.  ``tools/corpussoak.py --lazyclock`` clears it to
#: clock the PRODUCTION path instead: checkpoints stay lazy, so lap
#: time lumps at the batch's real blocking points (the driver collects
#: and the stage/publish barrier) — the split that says which
#: synchronization, not which logical stage, carries the constant.
STAGE_EAGER: list[bool] = [True]


def _lap_reset() -> None:
    import time

    _LAP_T0[0] = time.perf_counter()


def _lap(label: str) -> None:
    if STAGE_CLOCK is not None:
        import time

        now = time.perf_counter()
        STAGE_CLOCK[label] = STAGE_CLOCK.get(label, 0.0) + (now - _LAP_T0[0])
        _LAP_T0[0] = now


def _ckpt(df: DataFrame, label: str | None = None) -> DataFrame:
    """Stage-boundary pin.  EAGER only under the decompose clock (each
    boundary must be its own job for per-stage attribution); in
    production the checkpoint is LAZY — it still truncates lineage and
    materializes exactly once at first use, but folds into its first
    consumer's job instead of paying a blocking job per boundary.  The
    16-job floor this removes was the dominant share of the per-batch
    constant at fixture scale (SCALE.md §5 decompose)."""
    out = df.localCheckpoint(eager=STAGE_CLOCK is not None and STAGE_EAGER[0])
    if label is not None:
        _lap(label)
    return out


def extend_corpus_build(wh: Warehouse, batch: DataFrame, batch_id: int) -> bool:
    """Absorb one (doc_id, lang, source, n_chars, text) batch and re-emit
    the decision table, exactly once.  Returns False on re-delivery.

    See the module block for the cost split; stage-by-stage the batch
    pays: per-doc signals (batch), minhash + band probe against the
    persisted index (batch × bucket), cc over the star-reduced graph
    (labels + new pairs), span-gram delta + re-cut of the affected docs
    (changed docs only), DSIR bucket delta (changed docs), then the
    integer-state recomputes (length window, keep window, λ, budget,
    split, pack) over maintained per-doc scalars.

    The seventeen stage writes OVERLAP the compute chain (r13): each
    table's next version is submitted to a thread pool the moment its
    input frames are final (minhash/bands right after their batch
    checkpoints, labels after the closure, …, decisions last), instead
    of all seventeen waiting for the end of the chain — legal because a
    staged version is invisible until the single manifest ``publish``,
    which still happens once, after every future resolves.  Nothing
    about the exactly-once contract moves: bases are pinned before any
    write, a crash mid-chain leaves only orphan ``v=N+1`` directories
    the next attempt overwrites, and the pool is drained (never
    abandoned) on every exit path."""
    if batch_id <= last_built_batch(wh):
        return False
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=len(_ALL_TABLES))
    try:
        return _extend_corpus_build_impl(wh, batch, batch_id, pool)
    finally:
        # success drains naturally (every future's result is consumed
        # before publish); on an exception, cancel what never started
        # and wait out in-flight writes — they only touch orphan
        # version directories that the next attempt overwrites
        pool.shutdown(wait=True, cancel_futures=True)


def _extend_corpus_build_impl(
    wh: Warehouse, batch: DataFrame, batch_id: int, pool
) -> bool:
    bases = txn.begin_batch(
        wh,
        CB_DECISIONS,
        batch_id,
        {t: wh.current_version(t) for t in _ALL_TABLES},
    )
    staged_futures: dict = {}

    def _submit(table: str, fn) -> None:
        staged_futures[table] = pool.submit(fn)
    spark = batch.sparkSession
    _lap_reset()
    batch = _ckpt(batch, "00_batch_pin")

    # ----- per-doc static signals (batch-only raw-text work) ---------------
    sig_batch = _ckpt(_static_signals(batch), "01_signals_batch")
    # The accumulated signal table stays a LAZY plan (parquet ∪ pinned
    # batch), never checkpointed: materializing it would re-write the
    # corpus's RAW TEXT to local storage every batch — an O(corpus-text)
    # pass the whole architecture exists to avoid (measured: the r12
    # grown soak climbed 20 → 99 s/batch under exactly that) — and
    # would also defeat column pruning: each consumer below reads only
    # its 2-3 integer/metadata columns from the parquet scan; only the
    # span re-cut pass touches `text`, and only for the CHANGED docs.
    old_docs_t = wh.read(CB_DOCS, bases[CB_DOCS])
    #: r13: cb_docs is hive-partitioned on the doc-id range bucket, so
    #: every "fetch these docs' metadata/text" join below prunes to the
    #: target docs' buckets at planning time instead of scanning the
    #: corpus; a pre-r13 flat snapshot is migrated by one full
    #: partitioned stage on its first batch
    docs_legacy_flat = bases[CB_DOCS] >= 0 and "pb" not in old_docs_t.columns
    docs_all = old_docs_t.drop("pb").unionByName(sig_batch)

    def docs_for(ids_df: DataFrame, pbs: list) -> DataFrame:
        """Accumulated-signal rows for a small doc set — old rows by
        partition-pruned fetch, batch rows by join."""
        return _doc_subset(old_docs_t, ids_df, pbs).unionByName(
            sig_batch.join(ids_df, "doc_id")
        )

    _lap("02_docs_state_pin")

    # ----- near-dup pairs + labels (persisted-index probe, star-CC) --------
    per_doc_new = _ckpt(
        minhash_per_doc_frame(batch.select("doc_id", "text")),
        "03_minhash_batch",
    )
    bands_new = _ckpt(_band_table(per_doc_new), "04_bands_batch")
    per_doc_corpus = wh.read(CB_MINHASH, bases[CB_MINHASH])
    bands_corpus = wh.read(CB_BANDS, bases[CB_BANDS])
    corpus_max_n = _cb_max_n(wh, per_doc_corpus, bases[CB_MINHASH])
    # earliest-ready stage writes: these tables' inputs are final here
    _submit(
        CB_DOCS,
        (
            # legacy flat snapshot: one full partitioned stage migrates
            # the layout (O(corpus-text) once); then appends land in the
            # batch's own buckets forever
            (
                lambda: wh.stage(
                    CB_DOCS, docs_all.withColumn("pb", _pb_col()), ["pb"]
                )
            )
            if docs_legacy_flat
            else (
                lambda: wh.stage_append(
                    CB_DOCS,
                    sig_batch.withColumn("pb", _pb_col()),
                    bases[CB_DOCS],
                    partition_by=["pb"],
                )
            )
        ),
    )
    _submit(
        CB_MINHASH,
        lambda: wh.stage_append(CB_MINHASH, per_doc_new, bases[CB_MINHASH]),
    )
    _submit(
        CB_BANDS, lambda: wh.stage_append(CB_BANDS, bands_new, bases[CB_BANDS])
    )

    # ----- per-source length histogram (plans only; r13 job-floor fold:
    # the batch max-n, the folded histogram and the previous cut pairs
    # are all value-bounded control-plane rows, so they collect in ONE
    # tagged job instead of three sequential driver round-trips) -------
    batch_counts = sig_batch.groupBy("source", "n_chars").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    if bases[CB_LEN_HIST] < 0 and bases[CB_DOCS] >= 0:
        # legacy warehouse: one full metadata aggregation seeds the log
        len_seed = _ckpt(
            wh.read(CB_DOCS, bases[CB_DOCS])
            .groupBy("source", "n_chars")
            .agg(F.count("*").cast("bigint").alias("cnt")),
            "07_length_window_state",
        )
        len_log_delta = len_seed.unionByName(batch_counts)
        len_hist = _len_hist_collapse(len_seed.unionByName(batch_counts))
    else:
        len_log_delta = batch_counts
        len_hist = _len_hist_collapse(
            wh.read(CB_LEN_HIST, bases[CB_LEN_HIST]).unionByName(batch_counts)
        )
    len_hist = _ckpt(len_hist, "07_length_window_state")
    _nb = F.lit(None).cast("bigint")
    fused_scalars = per_doc_new.agg(
        F.max("n").cast("bigint").alias("a")
    ).select(
        F.lit("m").alias("t"),
        F.lit(None).cast("string").alias("s"),
        "a",
        _nb.alias("b"),
        _nb.alias("c"),
        _nb.alias("d"),
        F.lit(None).cast("boolean").alias("k"),
    ).unionByName(
        len_hist.select(
            F.lit("h").alias("t"),
            F.col("source").alias("s"),
            F.col("n_chars").cast("bigint").alias("a"),
            F.col("cnt").cast("bigint").alias("b"),
            _nb.alias("c"),
            _nb.alias("d"),
            F.lit(None).cast("boolean").alias("k"),
        )
    )
    if bases[CB_LEN_CUT] >= 0:
        fused_scalars = fused_scalars.unionByName(
            wh.read(CB_LEN_CUT, bases[CB_LEN_CUT]).select(
                F.lit("c").alias("t"),
                F.col("source").alias("s"),
                F.col("lo_n").cast("bigint").alias("a"),
                F.col("lo_id").cast("bigint").alias("b"),
                F.col("hi_n").cast("bigint").alias("c"),
                F.col("hi_id").cast("bigint").alias("d"),
                F.col("keep_any").alias("k"),
            )
        )
    fused_rows = fused_scalars.collect()
    _lap("B1_fused_scalar_collect")
    batch_max_n = next(
        (
            int(r["a"])
            for r in fused_rows
            if r["t"] == "m" and r["a"] is not None
        ),
        0,
    )
    old_cuts_rows = [
        {
            "source": r["s"],
            "keep_any": r["k"],
            "lo_n": r["a"],
            "lo_id": r["b"],
            "hi_n": r["c"],
            "hi_id": r["d"],
        }
        for r in fused_rows
        if r["t"] == "c"
    ]

    new_pairs = _ckpt(
        dedup_incremental_pairs(
            per_doc_new,
            bands_new,
            bands_corpus,
            per_doc_corpus,
            max_n=max(batch_max_n, corpus_max_n),
        ).select("doc_a", "doc_b", "jaccard"),
        "05_index_probe_pairs",
    )
    _submit(
        CB_PAIRS, lambda: wh.stage_append(CB_PAIRS, new_pairs, bases[CB_PAIRS])
    )
    # Touched components only (r13): a batch of new edges can alter
    # exactly the components holding a new-pair ENDPOINT, so the star
    # reduction is restricted to their members (one 2-int-column scan
    # of the label table, broadcast-filtered by the endpoints' labels)
    # and the closure runs over |touched members| + |batch pairs|
    # edges — the r12 form re-assembled a full O(corpus) label frame
    # per batch.
    old_labels_t = wh.read(CB_LABELS, bases[CB_LABELS])
    old_labels = old_labels_t.drop("pb")
    ep = _ckpt(
        new_pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(new_pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct(),
        "06_cc_incremental",
    )
    ep_lbl = (
        ep.join(
            _doc_subset(old_labels_t, ep, None).select("doc_id", "lbl"),
            "doc_id",
            "left",
        )
        .select(F.coalesce("lbl", "doc_id").alias("lbl"))
        .distinct()
    )
    touched_members = old_labels.join(F.broadcast(ep_lbl), "lbl").select(
        "doc_id", "lbl"
    )
    cc_out = _ckpt(
        cc_incremental(touched_members, new_pairs.select("doc_a", "doc_b")),
        "06_cc_incremental",
    )
    lbl_new_rows = _ckpt(
        cc_out.join(
            _doc_subset(old_labels_t, cc_out.select("doc_id"), None)
            .select("doc_id", F.col("lbl").alias("_old")),
            "doc_id",
            "left",
        )
        .filter(F.col("_old").isNull() | (F.col("lbl") != F.col("_old")))
        .select("doc_id", "lbl")
        .unionByName(
            sig_batch.select("doc_id")
            .join(cc_out, "doc_id", "left_anti")
            .select(F.col("doc_id"), F.col("doc_id").alias("lbl"))
        ),
        "06_cc_incremental",
    )
    lbl_changed = lbl_new_rows.select("doc_id")
    # full logical labeling — evaluated ONLY for a legacy flat-snapshot
    # migration (full_df); steady-state writes assemble from pruned
    # partitions via _patched_replacement
    labels = old_labels.join(lbl_changed, "doc_id", "left_anti").unionByName(
        lbl_new_rows
    )
    def _labels_stage():
        # the affected-bucket list collects INSIDE the worker thread, so
        # its driver round-trip overlaps the main chain like the write
        pbs = _affected_pbs(lbl_changed)
        return wh.stage_partition_delta(
            CB_LABELS,
            _patched_replacement(old_labels_t, lbl_changed, lbl_new_rows, pbs),
            pbs,
            bases[CB_LABELS],
            "pb",
            full_df=labels.withColumn("pb", _pb_col()),
        )

    _submit(CB_LABELS, _labels_stage)

    # ----- per-source length band (maintained histogram + cut pairs; r13) --
    # The r12 path recomputed a percent_rank window over EVERY doc's
    # (source, n_chars) metadata each batch.  Now the per-source length
    # histogram is maintained state (``cb_len_hist`` delta log); the
    # keep band's two order statistics — the (n_chars, doc_id) cut
    # pairs at the 5th/95th rank boundaries — are found by a cumulative
    # pass over the HISTOGRAM (O(distinct lengths), not O(docs)) plus
    # one boundary-value probe into the doc metadata, and the per-doc
    # length filter becomes a row-local comparison against the
    # broadcast cut pairs.  The probe's fetch also bounds the q_ok FLIP
    # SET exactly: a doc's keep status changed iff it lies between the
    # old and new cut pairs (or its source's band appeared/vanished).
    # The (source, n_chars, cnt) histogram rows and the previous cut
    # pairs arrived in the fused control-plane collect above; totals,
    # rank windows and boundary rows all resolve in the driver (the
    # histogram is value-bounded — distinct lengths per source — not
    # doc-bounded, so the collect stays control-plane-sized)
    from collections import defaultdict

    per_src: dict = defaultdict(list)
    for r in fused_rows:
        if r["t"] == "h":
            per_src[r["s"]].append((int(r["a"]), int(r["b"])))
    old_cut = {r["source"]: r for r in old_cuts_rows}
    #: legacy corpus without cut state: the flip set cannot be bounded
    #: this once — downstream consumers fall back to a full recompute
    len_flips_full = not old_cuts_rows and bases[CB_DOCS] >= 0
    bnd = {}
    no_band = []
    for s, rows in per_src.items():
        rows.sort()
        n = sum(c for _v, c in rows)
        rng = _keep_rank_range(n)
        if rng is None:
            no_band.append(s)
            continue
        r_lo, r_hi = rng
        e: dict = {}
        cum = 0
        for v, cnt in rows:
            cum += cnt
            if cum - cnt < r_lo <= cum:
                e["lo_n"], e["lo_k"] = v, r_lo - (cum - cnt)
            if cum - cnt < r_hi <= cum:
                e["hi_n"], e["hi_k"] = v, r_hi - (cum - cnt)
        bnd[s] = e
    # ONE metadata probe fetches (a) the boundary-value rows that
    # resolve the doc_id tie-breaks and (b) the old↔new flip-zone
    # superset, per source
    iv = []  # (source, n_lo, n_hi) inclusive n_chars intervals to fetch
    for s, e in bnd.items():
        o = old_cut.get(s)
        if o is not None and o["keep_any"]:
            iv.append((s, min(e["lo_n"], o["lo_n"]), max(e["lo_n"], o["lo_n"])))
            iv.append((s, min(e["hi_n"], o["hi_n"]), max(e["hi_n"], o["hi_n"])))
        else:
            # band appeared (or no old state): the whole new band flips
            iv.append((s, e["lo_n"], e["hi_n"]))
    for s in no_band:
        o = old_cut.get(s)
        if o is not None and o["keep_any"]:
            iv.append((s, o["lo_n"], o["hi_n"]))  # band vanished: all flip
    if iv:
        iv_df = local_df(spark, iv, "source string, a bigint, z bigint")
        fetched = _ckpt(
            docs_all.select("doc_id", "source", "n_chars", "static_ok")
            .join(F.broadcast(iv_df), "source")
            .filter(
                (F.col("n_chars") >= F.col("a"))
                & (F.col("n_chars") <= F.col("z"))
            )
            .select("doc_id", "source", "n_chars", "static_ok")
            .distinct(),
            "07_length_window_state",
        )
    else:
        fetched = spark.createDataFrame(
            [], "doc_id bigint, source string, n_chars bigint, static_ok boolean"
        )
    # resolve the k-th-smallest-doc_id tie-breaks from the fetched rows
    need = [
        (s, e["lo_n"], e["lo_k"], e["hi_n"], e["hi_k"]) for s, e in bnd.items()
    ]
    cut_rows = []
    if need:
        need_df = local_df(
            spark, need,
            "source string, lo_n bigint, lo_k bigint, hi_n bigint, hi_k bigint",
        )
        w_tie = Window.partitionBy("source", "n_chars").orderBy("doc_id")
        tie = (
            fetched.withColumn("rn", F.row_number().over(w_tie))
            .join(F.broadcast(need_df), "source")
            .filter(
                ((F.col("n_chars") == F.col("lo_n")) & (F.col("rn") == F.col("lo_k")))
                | ((F.col("n_chars") == F.col("hi_n")) & (F.col("rn") == F.col("hi_k")))
            )
            .collect()
        )
        _lap("B3_tie_collect")
        ids = {}
        for r in tie:
            e = ids.setdefault(r["source"], {})
            if r["n_chars"] == r["lo_n"] and r["rn"] == r["lo_k"]:
                e["lo_id"] = int(r["doc_id"])
            if r["n_chars"] == r["hi_n"] and r["rn"] == r["hi_k"]:
                e["hi_id"] = int(r["doc_id"])
        for s, e in bnd.items():
            cut_rows.append(
                (s, True, e["lo_n"], ids[s]["lo_id"], e["hi_n"], ids[s]["hi_id"])
            )
    for s in no_band:
        cut_rows.append((s, False, None, None, None, None))
    cuts_df = local_df(
        spark,
        cut_rows,
        "source string, keep_any boolean, lo_n bigint, lo_id bigint, "
        "hi_n bigint, hi_id bigint",
    )
    _submit(
        CB_LEN_HIST,
        lambda: wh.stage_append(
            CB_LEN_HIST, len_log_delta.coalesce(1), bases[CB_LEN_HIST]
        ),
    )
    # the cut pairs are a #sources-row control-plane snapshot
    _submit(CB_LEN_CUT, lambda: wh.stage(CB_LEN_CUT, cuts_df.coalesce(1)))
    # exact q_ok flip set: fetched docs whose keep status differs under
    # old vs new cut pairs (static-fail docs can never flip q_ok)
    old_cuts_df = local_df(
        spark,
        [
            (
                r["source"],
                bool(r["keep_any"]),
                r["lo_n"],
                r["lo_id"],
                r["hi_n"],
                r["hi_id"],
            )
            for r in old_cuts_rows
        ],
        "source string, keep_any boolean, lo_n bigint, lo_id bigint, "
        "hi_n bigint, hi_id bigint",
    )
    q_flips = (
        _q_ok_from_cuts(fetched, cuts_df)
        .withColumnRenamed("q_ok", "_new")
        .join(
            _q_ok_from_cuts(fetched, old_cuts_df).withColumnRenamed(
                "q_ok", "_old"
            ),
            "doc_id",
        )
        .filter(F.col("_new") != F.col("_old"))
        .select("doc_id")
    )

    # ----- keep window, CLUSTER-SCOPED (r13) -------------------------------
    # A cluster's canonical can change only if its membership changed
    # (new docs, relabeled docs) or a member's q_ok flipped (length-band
    # movement) — so the keep window recomputes over exactly those
    # clusters' members, and every other survivor row carries forward
    # untouched.  The r12 form ran the window over every q_ok doc in
    # the corpus per batch.
    old_surv_t = wh.read(CB_SURV, bases[CB_SURV])
    old_surv_full = old_surv_t.drop("pb")
    # full-corpus q_ok is consumed ONLY by the legacy migration branches
    # below; a steady-state batch never materializes it (its flip set +
    # candidate point lookups replace the corpus pass — r13: the
    # unconditional checkpoint here was one O(corpus-integer) scan per
    # batch doing no work for the delta path)
    q_ok = None
    if len_flips_full:
        # legacy corpus without cut state (unbounded flip set): one full
        # recompute migrates, then every later batch is scoped
        q_ok = _ckpt(
            _q_ok_from_cuts(docs_all, cuts_df), "07_length_window_state"
        )
        surv = _ckpt(_survivors(docs_all, q_ok, labels), "08_keep_window_state")
        winners = surv
        surv_del_keys = old_surv_full.select("doc_id")
        added = _ckpt(
            surv.select("doc_id").join(
                old_surv_full.select("doc_id"), "doc_id", "left_anti"
            ),
            "09_span_delta",
        )
        removed = _ckpt(
            old_surv_full.select("doc_id").join(
                surv.select("doc_id"), "doc_id", "left_anti"
            ),
            "09_span_delta",
        )
        surv_changed = _ckpt(
            surv.join(old_surv_full, ["doc_id", "cluster_id"], "left_anti")
            .select("doc_id")
            .unionByName(
                old_surv_full.join(surv, ["doc_id", "cluster_id"], "left_anti")
                .select("doc_id")
            )
            .distinct(),
            "08_keep_window_state",
        )
    else:
        fm = _ckpt(
            q_flips.unionByName(lbl_changed)
            .unionByName(sig_batch.select("doc_id"))
            .distinct(),
            "08_keep_window_state",
        )
        # each flip doc's cluster under the NEW labeling, plus the old
        # clusters relabeled docs LEFT
        fm_lbls = (
            fm.join(lbl_new_rows, "doc_id", "left")
            .join(
                _doc_subset(old_labels_t, fm, None).select(
                    "doc_id", F.col("lbl").alias("_ol")
                ),
                "doc_id",
                "left",
            )
            .select(
                F.coalesce("lbl", "_ol", "doc_id").alias("lbl")
            )
        )
        left_lbls = (
            _doc_subset(old_labels_t, lbl_changed, None).select("lbl")
        )
        aff_c = _ckpt(
            fm_lbls.unionByName(left_lbls).distinct(), "08_keep_window_state"
        )
        # members of the affected clusters under the NEW labeling: one
        # 2-int-column broadcast-filtered scan of the label table
        members = _ckpt(
            old_labels.join(lbl_changed, "doc_id", "left_anti")
            .unionByName(lbl_new_rows)
            .join(F.broadcast(aff_c), "lbl"),
            "08_keep_window_state",
        )
        mem_ids = members.select("doc_id")
        # metadata-only fetch (no text column): the scan is column-
        # pruned ints, so the join-only lookup skips a bucket collect
        meta = docs_for(mem_ids, None)
        winners = _ckpt(
            _survivors(
                meta,
                _q_ok_from_cuts(meta, cuts_df),
                members.select("doc_id", "lbl"),
            ),
            "08_keep_window_state",
        )
        aff_cid = F.broadcast(aff_c.withColumnRenamed("lbl", "cluster_id"))
        old_aff_surv = _ckpt(
            old_surv_full.join(aff_cid, "cluster_id"), "08_keep_window_state"
        )
        surv_del_keys = old_aff_surv.select("doc_id")
        added = _ckpt(
            winners.select("doc_id").join(
                surv_del_keys, "doc_id", "left_anti"
            ),
            "09_span_delta",
        )
        removed = _ckpt(
            surv_del_keys.join(
                winners.select("doc_id"), "doc_id", "left_anti"
            ),
            "09_span_delta",
        )
        surv_changed = _ckpt(
            winners.join(old_aff_surv, ["doc_id", "cluster_id"], "left_anti")
            .select("doc_id")
            .unionByName(
                old_aff_surv.join(
                    winners, ["doc_id", "cluster_id"], "left_anti"
                ).select("doc_id")
            )
            .distinct(),
            "08_keep_window_state",
        )
        # full logical survivor table — evaluated only for legacy full_df
        surv = old_surv_full.join(
            aff_cid, "cluster_id", "left_anti"
        ).unionByName(winners)

    def _surv_stage():
        pbs = _affected_pbs(surv_changed)
        return wh.stage_partition_delta(
            CB_SURV,
            _patched_replacement(old_surv_t, surv_del_keys, winners, pbs),
            pbs,
            bases[CB_SURV],
            "pb",
            full_df=surv.withColumn("pb", _pb_col()),
        )

    _submit(CB_SURV, _surv_stage)
    old_surv = old_surv_full.select("doc_id")
    old_posts_t = wh.read(CB_GRAM_POSTS, bases[CB_GRAM_POSTS])
    old_posts = old_posts_t.drop("pb")
    old_df = gram_df_state(wh, bases[CB_GRAM_DF])
    added_pbs = _affected_pbs(added)
    posts_add = _ckpt(
        span_gram_table(
            docs_for(added, added_pbs).select("doc_id", "text")
        )
        .select("g", "doc_id")
        .distinct(),
        "09_span_delta",
    )
    posts_rem = _ckpt(old_posts.join(removed, "doc_id"), "09_span_delta")
    delta = (
        posts_add.groupBy("g").agg(F.count("*").alias("d"))
        .unionByName(
            posts_rem.groupBy("g").agg((-F.count("*")).alias("d"))
        )
        .groupBy("g")
        .agg(F.sum("d").alias("d"))
    )
    df_merged = _ckpt(
        old_df.join(delta, "g", "full")
        .select(
            "g",
            (F.coalesce("df", F.lit(0)) + F.coalesce("d", F.lit(0)))
            .cast("bigint")
            .alias("df"),
            F.coalesce("d", F.lit(0)).alias("d"),
        ),
        "10_gram_df_merge",
    )
    gram_df = _ckpt(
        df_merged.filter(F.col("df") > 0).select("g", "df"), "10_gram_df_merge"
    )
    flipped = df_merged.filter(
        (F.col("d") != 0)
        & ((F.col("df") >= 2) != (F.col("df") - F.col("d") >= 2))
    ).select("g")
    # old survivors whose repeated-span structure changed under them
    # (old_posts' domain is the old survivors, so "still a survivor"
    # reduces to "not removed" — no full survivor-table membership join)
    affected_old = (
        old_posts.join(flipped, "g")
        .select("doc_id")
        .distinct()
        .join(removed, "doc_id", "left_anti")
        .join(added, "doc_id", "left_anti")
    )
    changed = _ckpt(added.unionByName(affected_old).distinct(), "09_span_delta")
    gone = changed.unionByName(removed)
    gone_pbs = _affected_pbs(gone)  # superset-prunes every text fetch below
    changed_docs = docs_for(changed, gone_pbs).select("doc_id", "text")
    repeated = gram_df.filter(F.col("df") >= 2).select("g")
    hits = (
        span_gram_table(changed_docs)
        .join(repeated, "g")
        .select("doc_id", "pos")
    )
    cut = _ckpt(
        cut_tokens_by_spans(changed_docs, spans_from_hits(hits)),
        "11_recut_changed",
    )
    clean_changed = cut.select(
        "doc_id", F.size("t_clean").cast("bigint").alias("n_clean")
    )
    # consumed three ways (doc_buckets merge, histogram delta, changed-doc
    # re-score) — pin once
    buckets_changed = _ckpt(
        _dsir_grams(
            cut.select("doc_id", F.array_join("t_clean", " ").alias("text")),
            "doc_id",
        )
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("k")),
        "11_recut_changed",
    )
    old_clean_t = wh.read(CB_CLEAN, bases[CB_CLEAN])
    old_buckets_t = wh.read(CB_DOC_BUCKETS, bases[CB_DOC_BUCKETS])
    # full logical merges — evaluated only for legacy full_df migration
    # and (clean) the C1 scored join; steady-state writes assemble from
    # pruned partitions via _patched_replacement
    clean_all = (
        old_clean_t.drop("pb")
        .join(gone, "doc_id", "left_anti")
        .unionByName(clean_changed)
    )
    doc_buckets = (
        old_buckets_t.drop("pb")
        .join(gone, "doc_id", "left_anti")
        .unionByName(buckets_changed)
    )
    posts_all = old_posts.join(removed, "doc_id", "left_anti").unionByName(
        posts_add
    )

    def _posts_stage():
        pbs = _affected_pbs(removed.unionByName(added))
        return wh.stage_partition_delta(
            CB_GRAM_POSTS,
            _patched_replacement(
                old_posts_t, removed.unionByName(added), posts_add, pbs
            ),
            pbs,
            bases[CB_GRAM_POSTS],
            "pb",
            full_df=posts_all.withColumn("pb", _pb_col()),
        )

    _submit(CB_GRAM_POSTS, _posts_stage)
    _submit(
        CB_GRAM_DF,
        lambda: wh.stage_append(
            CB_GRAM_DF,
            delta.filter(F.col("d") != 0).select(
                "g", F.col("d").cast("bigint").alias("df")
            ),
            bases[CB_GRAM_DF],
        ),
    )
    # clean/doc_buckets flip exactly the ``gone`` buckets (changed ⊆
    # gone by construction), so the text-fetch superset list already in
    # hand IS their affected-bucket list — no extra round-trip
    _submit(
        CB_CLEAN,
        lambda: wh.stage_partition_delta(
            CB_CLEAN,
            _patched_replacement(old_clean_t, gone, clean_changed, gone_pbs),
            gone_pbs,
            bases[CB_CLEAN],
            "pb",
            full_df=clean_all.withColumn("pb", _pb_col()),
        ),
    )
    _submit(
        CB_DOC_BUCKETS,
        lambda: wh.stage_partition_delta(
            CB_DOC_BUCKETS,
            _patched_replacement(
                old_buckets_t, gone, buckets_changed, gone_pbs
            ),
            gone_pbs,
            bases[CB_DOC_BUCKETS],
            "pb",
            full_df=doc_buckets.withColumn("pb", _pb_col()),
        ),
    )
    _lap("12_span_state_merge")

    # ----- DSIR λ + scores (maintained bounded state — r13) ----------------
    # The r12 path re-aggregated the WHOLE cb_doc_buckets table into the
    # source/target histograms and re-scored every doc per batch —
    # O(corpus-buckets) twice over.  Now the histograms are maintained
    # state (``cb_dsir_hist``, ≤ DSIR_BUCKETS rows after folding): the
    # batch's histogram delta is (changed docs' new bucket rows) minus
    # (gone docs' old rows, partition-pruned fetch), λ old/new evaluate
    # in the DRIVER from the collected histograms (exact ints), and the
    # per-doc (n_grams, w_bits) state table ``cb_rate`` updates only for
    # (a) changed/gone docs and (b) docs holding a bucket whose
    # whole-bit λ actually flipped — λ flips need a count ratio to cross
    # a power of two, so each bucket flips O(log corpus) times EVER and
    # the flip-scan amortizes to zero as the corpus grows.
    gone_b = _doc_subset(old_buckets_t, gone, gone_pbs)
    langs = docs_for(gone, gone_pbs).select(
        "doc_id", (F.col("lang") == F.lit("en")).alias("_en")
    )
    delta_rows = buckets_changed.select(
        "doc_id", "b", F.col("k").cast("bigint").alias("k")
    ).unionByName(
        gone_b.select("doc_id", "b", (-F.col("k")).cast("bigint").alias("k"))
    )
    hist_delta = (
        delta_rows.join(langs, "doc_id")
        .groupBy("b")
        .agg(
            F.sum("k").cast("bigint").alias("cs"),
            F.sum(F.when(F.col("_en"), F.col("k")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("ct"),
        )
        .filter((F.col("cs") != 0) | (F.col("ct") != 0))
    )
    hist_delta = _ckpt(hist_delta, "13_dsir_hist_delta")
    if bases[CB_DSIR_HIST] < 0 and bases[CB_DOC_BUCKETS] >= 0:
        # legacy warehouse (pre-histogram builds): ONE full aggregation
        # seeds the log — the stage_partition_delta migration rule
        seed = _ckpt(
            old_buckets_t
            .drop("pb")
            .join(
                docs_all.select(
                    "doc_id", (F.col("lang") == F.lit("en")).alias("_en")
                ),
                "doc_id",
            )
            .groupBy("b")
            .agg(
                F.sum("k").cast("bigint").alias("cs"),
                F.sum(F.when(F.col("_en"), F.col("k")).otherwise(F.lit(0)))
                .cast("bigint")
                .alias("ct"),
            ),
            "13_dsir_hist_delta",
        )
        old_hist = seed.filter(F.col("cs") > 0)
        hist_log_delta = seed.unionByName(hist_delta)
    else:
        old_hist = dsir_hist_state(wh, bases[CB_DSIR_HIST])
        hist_log_delta = hist_delta
    _submit(
        CB_DSIR_HIST,
        lambda: wh.stage_append(
            CB_DSIR_HIST, hist_log_delta.coalesce(1), bases[CB_DSIR_HIST]
        ),
    )
    # ONE tagged collect for both the old state and the batch delta
    # (≤ 2·DSIR_BUCKETS control-plane rows)
    both = old_hist.select(
        F.lit(0).alias("_t"), "b", "cs", "ct"
    ).unionByName(
        hist_delta.select(F.lit(1).alias("_t"), "b", "cs", "ct")
    ).collect()
    _lap("B4_dsir_collect")
    oh_rows = [r for r in both if r["_t"] == 0]
    lam_old = _lam_map(oh_rows)
    counts = {r["b"]: [r["cs"], r["ct"]] for r in oh_rows}
    for r in both:
        if r["_t"] == 1:
            c = counts.setdefault(r["b"], [0, 0])
            c[0] += r["cs"]
            c[1] += r["ct"]
    nh_rows = [
        {"b": b, "cs": cs, "ct": ct}
        for b, (cs, ct) in counts.items()
        if cs > 0
    ]
    lam_new = _lam_map(nh_rows)
    lam_new_df = local_df(
        spark,
        [(int(b), int(l)) for b, l in lam_new.items()],
        "b bigint, lam bigint",
    )
    dlam = [
        (int(b), int(lam_new[b] - lam_old[b]))
        for b in lam_old
        if b in lam_new and lam_new[b] != lam_old[b]
    ]
    rate_changed = _dsir_score(buckets_changed, lam_new_df).select(
        "doc_id", "n_grams", "w_bits"
    )
    old_rate_t = wh.read(CB_RATE, bases[CB_RATE])
    old_rate = old_rate_t.drop("pb")
    if bases[CB_RATE] < 0 and bases[CB_DOC_BUCKETS] >= 0:
        # legacy migration: rebuild the per-doc rate state once from the
        # merged buckets under the NEW λ (then bounded forever)
        rate_state = _ckpt(
            _dsir_score(doc_buckets, lam_new_df).select(
                "doc_id", "n_grams", "w_bits"
            ),
            "13_dsir_scoring",
        )
        rate_touched = None  # full table (first partitioned stage)
        rate_new_rows = rate_state
    elif dlam:
        dl_df = local_df(spark, dlam, "b bigint, dl bigint")
        aff_w = _ckpt(
            old_buckets_t.drop("pb")
            .join(F.broadcast(dl_df), "b")
            .groupBy("doc_id")
            .agg(F.sum(F.col("k") * F.col("dl")).cast("bigint").alias("dw"))
            .join(gone, "doc_id", "left_anti"),
            "13_dsir_scoring",
        )
        adj = old_rate.join(aff_w, "doc_id").select(
            "doc_id",
            "n_grams",
            (F.col("w_bits") + F.col("dw")).cast("bigint").alias("w_bits"),
        )
        rate_new_rows = _ckpt(
            adj.unionByName(rate_changed), "13_dsir_scoring"
        )
        rate_touched = gone.unionByName(aff_w.select("doc_id"))
        rate_state = (
            old_rate.join(rate_touched.distinct(), "doc_id", "left_anti")
            .unionByName(rate_new_rows)
        )
    else:
        rate_new_rows = rate_changed
        rate_touched = gone
        rate_state = old_rate.join(gone, "doc_id", "left_anti").unionByName(
            rate_changed
        )
    rate = rate_state.select(
        "doc_id",
        F.expr("(1000 * w_bits) div n_grams").cast("bigint").alias(
            "rate_mbits"
        ),
    )

    def _rate_stage():
        if rate_touched is None:
            # legacy migration (rate table absent, corpus present): one
            # full partitioned stage; bounded partition deltas after
            return wh.stage(
                CB_RATE, rate_state.withColumn("pb", _pb_col()), ["pb"]
            )
        pbs = _affected_pbs(rate_touched)
        return wh.stage_partition_delta(
            CB_RATE,
            _patched_replacement(old_rate_t, rate_touched, rate_new_rows, pbs),
            pbs,
            bases[CB_RATE],
            "pb",
            full_df=rate_state.withColumn("pb", _pb_col()),
        )

    _submit(CB_RATE, _rate_stage)

    # ----- budget cut / split / pack, CHANGE-SCOPED (r13) ------------------
    # The r12 path assembled a full scored frame per batch, ran the
    # token-budget windows over every survivor, the pack running sum
    # over every selected train doc, re-assembled every decision row,
    # and null-safe-diffed the lot.  Now:
    #  * the budget line comes from the maintained score-tier token
    #    histogram (``cb_tier_hist``; O(tiers) driver pass), and the
    #    within-tier cut position is an order statistic of the CUT TIER
    #    alone — selection becomes a row-local (score, doc_id) cut-pair
    #    comparison, and its flips are found by one selective scan of
    #    the stored ``selected`` flags (stored selected ≡ the old
    #    predicate, by induction);
    #  * pack ids recompute per shard only from the FIRST doc whose
    #    (selected ∧ train, n_tokens) contribution changed, with the
    #    prefix sum below that point taken from unchanged stored rows;
    #  * decision rows re-assemble and diff only for the candidate set
    #    (every flip source unioned), never the corpus.
    old_dec_t = wh.read(CB_DECISIONS, bases[CB_DECISIONS])
    old_dec = old_dec_t.drop("pb")
    legacy_full = len_flips_full or rate_touched is None
    if legacy_full:
        # legacy migration (pre-r13 state tables absent): the full
        # recompute, once — also seeds the tier histogram
        if q_ok is None:  # rate migration without a length migration
            q_ok = _ckpt(
                _q_ok_from_cuts(docs_all, cuts_df), "14_budget_cut"
            )
        scored = _ckpt(
            surv.select("doc_id")
            .join(clean_all, "doc_id")
            .join(rate, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(
                    F.expr(f"rate_mbits div {CORPUS_DSIR_TIER}"),
                    F.lit(CORPUS_LOW_TIER),
                )
                .cast("bigint")
                .alias("score"),
                F.col("n_clean").alias("n_tokens"),
            ),
            "13_dsir_scoring",
        )
        budget = scored.agg(
            F.expr(f"sum(n_tokens) * {BUDGET_PCT} div 100")
        ).collect()[0][0]
        sel = _ckpt(
            token_budget_select(scored, int(budget or 0)), "14_budget_cut"
        )
        spl = split_leakage_free(
            surv.join(sel.filter("selected").select("doc_id"), "doc_id")
        ).select("doc_id", "split")
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
        decisions = _ckpt(
            docs_all.select("doc_id")
            .join(q_ok, "doc_id")
            .join(
                surv.select("doc_id", F.lit(True).alias("is_surv")),
                "doc_id",
                "left",
            )
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
            ),
            "15_decisions_assemble",
        )
        dec_new = decisions
        dec_cand_keys = None  # full diff below
        tier_log_delta = _tier_hist_collapse(
            scored.groupBy("score")
            .agg(F.sum("n_tokens").cast("bigint").alias("st"))
            .unionByName(
                _tier_hist_collapse(
                    wh.read(CB_TIER_HIST, bases[CB_TIER_HIST])
                ).select("score", (-F.col("st")).alias("st"))
            )
        )
    else:
        cand0 = _ckpt(rate_touched.distinct(), "14_budget_cut")
        cand0_pbs = None  # int-only lookups: join-only, no bucket collect

        def scored_rows_for(ids_df, pbs):
            """Current (doc_id, cluster_id, score, n_tokens) of the ids
            that are CURRENT survivors — point lookups against the
            patched survivor/clean/rate states."""
            s = _patched_rows_for(old_surv_t, surv_del_keys, winners, ids_df, pbs)
            c = _patched_rows_for(old_clean_t, gone, clean_changed, ids_df, pbs)
            r = _patched_rows_for(
                old_rate_t, rate_touched, rate_new_rows, ids_df, pbs
            ).select(
                "doc_id",
                F.expr("(1000 * w_bits) div n_grams").alias("rate_mbits"),
            )
            return (
                s.select("doc_id", "cluster_id")
                .join(c, "doc_id")
                .join(r, "doc_id", "left")
                .select(
                    "doc_id",
                    "cluster_id",
                    F.coalesce(
                        F.expr(f"rate_mbits div {CORPUS_DSIR_TIER}"),
                        F.lit(CORPUS_LOW_TIER),
                    )
                    .cast("bigint")
                    .alias("score"),
                    F.col("n_clean").cast("bigint").alias("n_tokens"),
                )
            )

        new_scored_cand = _ckpt(
            scored_rows_for(cand0, cand0_pbs), "14_budget_cut"
        )
        old_dec_cand0 = _doc_subset(old_dec_t, cand0, cand0_pbs)
        tier_log_delta = _ckpt(
            _tier_hist_collapse(
                old_dec_cand0.filter(F.col("stage").isin("budget", "kept"))
                .select(
                    F.col("score_tier").alias("score"),
                    (-F.col("n_tokens_clean")).alias("st"),
                )
                .unionByName(
                    new_scored_cand.select(
                        "score", F.col("n_tokens").alias("st")
                    )
                )
            ),
            "14_budget_cut",
        )
        # ONE blocking job resolves the whole budget line (r13 job-floor
        # fold; previously a tier-histogram collect, a driver loop, and
        # a second in-tier window collect): the folded tier histogram's
        # cumulative pass, the cut-tier pick, and the within-tier order
        # statistic evaluate in a single DAG whose result is ≤ 1 row —
        # (s_star, id_star).  The cumulative window runs over O(tiers)
        # rows (value-bounded); the in-tier window over the CUT TIER's
        # members only, exactly as before.
        folded_tiers = _tier_hist_collapse(
            wh.read(CB_TIER_HIST, bases[CB_TIER_HIST]).unionByName(
                tier_log_delta
            )
        )
        w_desc = Window.orderBy(F.desc("score"))
        t_cum = folded_tiers.select(
            "score",
            "st",
            F.coalesce(
                F.sum("st").over(
                    w_desc.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("before"),
            F.sum("st")
            .over(
                w_desc.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("total"),
        )
        # first (highest) tier whose cumulative mass crosses the budget;
        # the crossing is monotone, so min-by-desc-score == the driver
        # loop's break tier
        cut_tier = (
            t_cum.withColumn(
                "budget", F.expr(f"total * {BUDGET_PCT} div 100")
            )
            .filter(F.col("before") + F.col("st") > F.col("budget"))
            .orderBy(F.desc("score"))
            .limit(1)
            .select(
                F.col("score").alias("s_star"), "before", "budget"
            )
        )
        tier_members = (
            old_dec.filter(F.col("stage").isin("budget", "kept"))
            .join(cand0, "doc_id", "left_anti")
            .select(
                "doc_id",
                F.col("score_tier").alias("score"),
                F.col("n_tokens_clean").alias("n_tokens"),
            )
            .unionByName(
                new_scored_cand.select("doc_id", "score", "n_tokens")
            )
            .join(
                F.broadcast(cut_tier),
                F.col("score") == F.col("s_star"),
            )
        )
        w_in_tier = Window.orderBy("doc_id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        in_tier_last = (
            tier_members.withColumn(
                "cum", F.sum("n_tokens").over(w_in_tier)
            )
            .filter(F.col("before") + F.col("cum") <= F.col("budget"))
            .agg(F.max("doc_id").alias("id_star"))
        )
        cut_row = cut_tier.crossJoin(in_tier_last).collect()
        _lap("B5_budget_cut_collect")
        if cut_row:
            s_star = int(cut_row[0]["s_star"])
            id_star = (
                int(cut_row[0]["id_star"])
                if cut_row[0]["id_star"] is not None
                else -1
            )
            sel_pred = (F.col("score") > F.lit(s_star)) | (
                (F.col("score") == F.lit(s_star))
                & (F.col("doc_id") <= F.lit(id_star))
            )
            sel_pred_old_cols = (F.col("score_tier") > F.lit(s_star)) | (
                (F.col("score_tier") == F.lit(s_star))
                & (F.col("doc_id") <= F.lit(id_star))
            )
        else:  # the whole corpus fits the budget: every survivor selected
            sel_pred = F.lit(True)
            sel_pred_old_cols = F.lit(True)
        # selection flips OUTSIDE the candidate set: the stored selected
        # flag IS the old predicate, so one selective scan finds them
        sel_flips_old = _ckpt(
            old_dec.filter(F.col("stage").isin("budget", "kept"))
            .join(cand0, "doc_id", "left_anti")
            .filter(F.col("selected") != sel_pred_old_cols)
            .select("doc_id"),
            "14_budget_cut",
        )
        cand1 = _ckpt(
            cand0.unionByName(surv_changed)
            .unionByName(q_flips)
            .unionByName(sig_batch.select("doc_id"))
            .unionByName(sel_flips_old)
            .distinct(),
            "15_decisions_assemble",
        )
        cand1_pbs = None  # metadata/int lookups below: join-only
        q1 = _q_ok_from_cuts(docs_for(cand1, cand1_pbs), cuts_df)
        scored_c1 = _ckpt(
            scored_rows_for(cand1, cand1_pbs).withColumn(
                "selected", sel_pred
            ),
            "15_decisions_assemble",
        )
        spl_c1 = split_leakage_free(
            scored_c1.filter("selected").select("doc_id", "cluster_id")
        ).select("doc_id", "split")
        # ----- pack zone: per shard, everything after the first doc
        # whose (selected ∧ train) token contribution changed
        old_c1 = _doc_subset(old_dec_t, cand1, cand1_pbs)
        contrib_old = old_c1.filter(
            F.col("selected") & (F.col("split") == "train")
        ).select("doc_id", F.col("n_tokens_clean").alias("n_tokens"))
        contrib_new = (
            scored_c1.filter("selected")
            .join(spl_c1, "doc_id")
            .filter(F.col("split") == "train")
            .select("doc_id", "n_tokens")
        )
        pack_seed = (
            contrib_old.select("doc_id", F.col("n_tokens").alias("_a"))
            .join(
                contrib_new.select("doc_id", F.col("n_tokens").alias("_b")),
                "doc_id",
                "full",
            )
            .filter(~F.col("_a").eqNullSafe(F.col("_b")))
            .select("doc_id")
        )
        # the per-shard zone starts stay a (broadcast) FRAME — no driver
        # round-trip: an empty seed set flows through as an empty join
        # (r13 job-floor shave; the old code collected the starts only
        # to re-create them as a literal frame)
        starts_df = F.broadcast(
            pack_seed.groupBy(
                F.expr(f"doc_id % {PACK_SHARDS}").alias("shard")
            ).agg(F.min("doc_id").alias("start"))
        )
        cur_contrib = (
            old_dec.filter(
                F.col("selected") & (F.col("split") == "train")
            )
            .join(cand1, "doc_id", "left_anti")
            .select("doc_id", F.col("n_tokens_clean").alias("n_tokens"))
            .unionByName(contrib_new)
            .withColumn("shard", F.expr(f"doc_id % {PACK_SHARDS}"))
            .join(starts_df, "shard")
        )
        prefix = (
            cur_contrib.filter(F.col("doc_id") < F.col("start"))
            .groupBy("shard")
            .agg(F.sum("n_tokens").cast("bigint").alias("base"))
        )
        w_zone = (
            Window.partitionBy("shard")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        packed_zone = _ckpt(
            cur_contrib.filter(F.col("doc_id") >= F.col("start"))
            .join(prefix, "shard", "left")
            .select(
                "doc_id",
                "shard",
                "n_tokens",
                F.coalesce("base", F.lit(0)).alias("base"),
            )
            .select(
                "doc_id",
                F.floor(
                    (
                        F.col("base")
                        + F.coalesce(
                            F.sum("n_tokens").over(w_zone), F.lit(0)
                        )
                    )
                    / PACK_BUDGET_TOKENS
                )
                .cast("bigint")
                .alias("pack_id"),
            ),
            "15_decisions_assemble",
        )
        # pack flips OUTSIDE cand1: zone docs whose pack_id moved
        pack_flips = (
            packed_zone.join(cand1, "doc_id", "left_anti")
            .join(
                old_dec.select("doc_id", F.col("pack_id").alias("_op")),
                "doc_id",
            )
            .filter(~F.col("pack_id").eqNullSafe(F.col("_op")))
            .select("doc_id")
        )
        # ----- assemble + diff ONLY the candidates
        dec_new_c1 = (
            q1.join(
                scored_c1.select(
                    "doc_id",
                    F.lit(True).alias("is_surv"),
                    "score",
                    "n_tokens",
                    "selected",
                ),
                "doc_id",
                "left",
            )
            .join(spl_c1, "doc_id", "left")
            .join(
                # pack for candidates: zone value where recomputed, else
                # the stored value (a candidate below its shard's zone
                # start has an unchanged prefix by construction)
                packed_zone.select(
                    "doc_id", F.col("pack_id").alias("_zp")
                ),
                "doc_id",
                "left",
            )
            .join(
                old_c1.select("doc_id", F.col("pack_id").alias("_sp")),
                "doc_id",
                "left",
            )
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
                F.when(
                    F.col("selected") & (F.col("split") == "train"),
                    F.coalesce("_zp", "_sp"),
                )
                .otherwise(F.lit(None))
                .cast("bigint")
                .alias("pack_id"),
            )
        )
        pack_flips = _ckpt(pack_flips, "15_decisions_assemble")
        dec_new_flips = (
            _doc_subset(old_dec_t, pack_flips, None)
            .drop("pack_id")
            .join(
                packed_zone.select(
                    "doc_id", F.col("pack_id").cast("bigint").alias("pack_id")
                ),
                "doc_id",
            )
            .select("doc_id", *DECISION_COLS)
        )
        dec_new = _ckpt(
            dec_new_c1.unionByName(dec_new_flips), "15_decisions_assemble"
        )
        dec_cand_keys = dec_new.select("doc_id")
        # full logical decision table — evaluated only for legacy full_df
        decisions = old_dec.join(
            dec_cand_keys, "doc_id", "left_anti"
        ).unionByName(dec_new)
    # null-safe diff of the (candidate-restricted) new rows vs pinned base
    if dec_cand_keys is not None:
        old_for_diff = _doc_subset(old_dec_t, dec_cand_keys, None)
    else:
        old_for_diff = old_dec
    dec_diff = _ckpt(
        dec_new.join(
            old_for_diff.select(
                "doc_id",
                F.lit(True).alias("_was"),
                *[F.col(c).alias(f"_o_{c}") for c in DECISION_COLS],
            ),
            "doc_id",
            "left",
        ).filter(
            F.col("_was").isNull()
            | ~(
                F.col("stage").eqNullSafe(F.col("_o_stage"))
                & F.col("n_tokens_clean").eqNullSafe(F.col("_o_n_tokens_clean"))
                & F.col("score_tier").eqNullSafe(F.col("_o_score_tier"))
                & F.col("selected").eqNullSafe(F.col("_o_selected"))
                & F.col("split").eqNullSafe(F.col("_o_split"))
                & F.col("pack_id").eqNullSafe(F.col("_o_pack_id"))
            )
        ),
        "16_decision_diff",
    )
    # TEXT-REFRESH rows: a re-cut doc whose span structure changed can
    # keep a bit-identical decision row (same token COUNT after a
    # different cut) while its cleaned TEXT — what the pack artifact
    # actually ships — changed.  Log those pack members too, with
    # old_stage = stage (a visible no-op for decision replay, which
    # stays latest-wins-exact), so a consumer tailing the log re-derives
    # their text instead of silently drifting from a re-materialization.
    refresh = (
        dec_new.join(changed, "doc_id")
        .join(dec_diff.select("doc_id"), "doc_id", "left_anti")
        .filter(F.col("selected") & (F.col("split") == "train"))
        .select(
            "doc_id", F.col("stage").alias("_o_stage"), *DECISION_COLS
        )
    )
    change_log = (
        dec_diff.select("doc_id", "_o_stage", *DECISION_COLS)
        .unionByName(refresh)
        .select(
            F.lit(int(batch_id)).cast("bigint").alias("batch_id"),
            "doc_id",
            F.col("_o_stage").alias("old_stage"),
            *DECISION_COLS,
        )
    )

    # ----- one atomic publish, then the marker ------------------------------
    # Grow-only tables (docs/signatures/bands/pairs/change-log and the
    # gram-df delta log) stage as file-level appends: base files
    # hard-linked, only the batch's delta written.  Mutable per-doc
    # tables (postings/clean/buckets and the recomputed labels/
    # survivors/decisions) stage as PARTITION deltas over the flipped
    # doc-id buckets.  Per-batch write cost is O(batch + flips) for all
    # twelve tables — never O(corpus).  full_df on the partition deltas
    # is the legacy-layout migration escape: a pre-delta flat snapshot
    # is rewritten partitioned ONCE, then bounded forever.
    #
    # Fourteen of the writes were already submitted above, each the
    # moment its inputs were final — so by here they have been running
    # UNDER the integer-tier compute (r13; the r12 form held all writes
    # to a single barrier at this point, making stage_publish the
    # largest slice of the per-batch constant).  The three remaining
    # tables' frames only finalize with the decision diff.
    _submit(
        CB_TIER_HIST,
        lambda: wh.stage_append(
            CB_TIER_HIST, tier_log_delta.coalesce(1), bases[CB_TIER_HIST]
        ),
    )

    def _decisions_stage():
        pbs = _affected_pbs(dec_diff.select("doc_id"))
        return wh.stage_partition_delta(
            CB_DECISIONS,
            _patched_replacement(
                old_dec_t,
                dec_diff.select("doc_id"),
                dec_diff.select("doc_id", *DECISION_COLS),
                pbs,
            ),
            pbs,
            bases[CB_DECISIONS],
            "pb",
            full_df=decisions.withColumn("pb", _pb_col()),
        )

    _submit(CB_DECISIONS, _decisions_stage)
    _submit(
        CB_CHANGELOG,
        lambda: wh.stage_append(CB_CHANGELOG, change_log, bases[CB_CHANGELOG]),
    )
    staged = {t: staged_futures[t].result() for t in _ALL_TABLES}
    wh.publish(staged)
    _write_cb_stats(
        wh, staged[CB_MINHASH], max(batch_max_n, corpus_max_n)
    )
    txn.commit_batch(wh, CB_DECISIONS, batch_id)
    _lap("17_stage_publish")
    maintain_corpus_build(wh)
    _lap("18_compaction")
    return True


# --------------------------------------------------------------------------
# Change-log CONSUMER: incremental pack materialization (r13)
# --------------------------------------------------------------------------

MAT_MEMBERS = "corpus_pack_members"
MAT_PACKS = "corpus_packs_live"
#: pack-id range per physical partition of the live packs table — the
#: single partition key is shard + PACK_SHARDS·(pack_id div range), so
#: a batch's pack churn rewrites only the pack ranges it touched.
MAT_PACK_RANGE = 128


def _ppb_expr():
    return (
        F.col("shard")
        + F.lit(PACK_SHARDS) * F.expr(f"pack_id div {MAT_PACK_RANGE}")
    ).cast("bigint")


def extend_materialized_corpus(wh: Warehouse, eos: str = " <eos> ") -> bool:
    """Maintain the packed TRAIN artifact by TAILING ``cb_decision_log``
    — the certified CONSUMER of the build's CDC product (the r12
    verdict's missing piece: the log existed, but the thing it exists
    FOR still re-read the full decision table).

    Per call it advances the artifact to the build's head: the log tail
    (latest-wins per doc over the un-consumed batches) names every doc
    whose pack membership or cleaned text may have moved; the affected
    PACKS are the union of those docs' old and new (shard, pack_id);
    only those packs' rows re-aggregate, from a slim integer membership
    table (``corpus_pack_members``) plus a re-derivation of just the
    affected members' cleaned text against the build's maintained
    repeated-gram state.  Per-batch cost tracks the LOG, never the
    corpus; the artifact is golden-pinned byte-identical to a full
    re-materialization (``materialize_corpus_build``'s aggregation)
    after every batch, including pack evictions.

    Exactly-once with the build's own txn discipline: marker =
    last-consumed build batch; a pre-publish intent pins the member and
    pack base versions, so a crash between publish and marker replays
    against the pinned bases (alias-mapped for vacuum).  Returns False
    when there is nothing new to consume (idle / re-delivery no-op)."""
    spark = wh.spark
    last = txn.last_batch(wh, MAT_PACKS)
    head = last_built_batch(wh)
    if head <= last:
        return False
    bases = txn.begin_batch(
        wh,
        MAT_PACKS,
        head,
        {
            "members": wh.current_version(MAT_MEMBERS),
            "packs": wh.current_version(MAT_PACKS),
        },
        tables={"members": MAT_MEMBERS, "packs": MAT_PACKS},
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("batch_id"))
    tail = (
        wh.read(CB_CHANGELOG)
        .filter(F.col("batch_id") > last)
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("doc_id", "selected", "split", "pack_id", "n_tokens_clean")
        .localCheckpoint(eager=True)
    )
    tail_ids = tail.select("doc_id")
    t_pbs = _affected_pbs(tail_ids)
    mm_t = wh.read(MAT_MEMBERS, bases["members"])
    old_mm = _doc_subset(mm_t, tail_ids, t_pbs)
    new_mm = (
        tail.filter(F.col("selected") & (F.col("split") == "train"))
        .select(
            "doc_id",
            F.expr(f"doc_id % {PACK_SHARDS}").cast("bigint").alias("shard"),
            F.col("pack_id").cast("bigint").alias("pack_id"),
            F.col("n_tokens_clean").cast("bigint").alias("n_tokens"),
        )
        .localCheckpoint(eager=True)
    )
    aff_packs = (
        old_mm.select("shard", "pack_id")
        .unionByName(new_mm.select("shard", "pack_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # current members of the affected packs: slim 4-int scan of the
    # membership table, broadcast-filtered, patched with the tail
    mem_aff = (
        mm_t.drop("pb")
        .join(tail_ids, "doc_id", "left_anti")
        .join(F.broadcast(aff_packs), ["shard", "pack_id"])
        .unionByName(new_mm.join(aff_packs, ["shard", "pack_id"], "left_semi"))
        .localCheckpoint(eager=True)
    )
    # re-derive ONLY those members' cleaned text against the build's
    # maintained repeated-gram state (the build's own re-cut shape)
    ids = mem_aff.select("doc_id").distinct()
    ids_pbs = _affected_pbs(ids)
    docs_txt = _doc_subset(wh.read(CB_DOCS), ids, ids_pbs).select(
        "doc_id", "text"
    )
    repeated = gram_df_state(wh).filter(F.col("df") >= 2).select("g")
    hits = (
        span_gram_table(docs_txt).join(repeated, "g").select("doc_id", "pos")
    )
    cuts = cut_tokens_by_spans(docs_txt, spans_from_hits(hits)).select(
        "doc_id", F.array_join("t_clean", " ").alias("text_clean")
    )
    member = F.array_sort(F.collect_list(F.struct("doc_id", "text_clean")))
    new_packs = (
        mem_aff.join(cuts, "doc_id")
        .groupBy("shard", "pack_id")
        .agg(
            member.alias("_m"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
            F.count("*").cast("bigint").alias("n_docs"),
        )
        .select(
            "shard",
            "pack_id",
            F.concat_ws(
                eos, F.expr("transform(_m, x -> x.text_clean)")
            ).alias("packed_text"),
            "pack_tokens",
            "n_docs",
        )
    )
    # ---- stage both tables, one atomic publish, then the marker
    mm_full = (
        mm_t.drop("pb").join(tail_ids, "doc_id", "left_anti").unionByName(new_mm)
    )
    mp_t = wh.read(MAT_PACKS, bases["packs"])
    ppbs = sorted(
        {
            int(r["shard"]) + PACK_SHARDS * (int(r["pack_id"]) // MAT_PACK_RANGE)
            for r in aff_packs.collect()
        }
    )
    base_p = mp_t
    if "ppb" in base_p.columns:
        base_p = (
            base_p.filter(F.col("ppb").isin(ppbs)) if ppbs else base_p.limit(0)
        )
    packs_repl = (
        base_p.drop("ppb")
        .join(aff_packs, ["shard", "pack_id"], "left_anti")
        .unionByName(new_packs)
        .withColumn("ppb", _ppb_expr())
    )
    packs_full = (
        mp_t.drop("ppb")
        .join(aff_packs, ["shard", "pack_id"], "left_anti")
        .unionByName(new_packs)
        .withColumn("ppb", _ppb_expr())
    )
    staged = {
        MAT_MEMBERS: wh.stage_partition_delta(
            MAT_MEMBERS,
            _patched_replacement(mm_t, tail_ids, new_mm, t_pbs),
            t_pbs,
            bases["members"],
            "pb",
            full_df=mm_full.withColumn("pb", _pb_col()),
        ),
        MAT_PACKS: wh.stage_partition_delta(
            MAT_PACKS,
            packs_repl,
            ppbs,
            bases["packs"],
            "ppb",
            full_df=packs_full,
        ),
    }
    wh.publish(staged)
    txn.commit_batch(wh, MAT_PACKS, head)
    return True


def corpus_build_monolithic(docs: DataFrame) -> DataFrame:
    """Frame-form monolithic comparator: the full-rebuild decision table
    over any (doc_id, lang, source, n_chars, text) frame, assembled from
    the same certified pieces ``prep_corpus_e2e`` composes over the
    fixture — the independent ground truth the incremental goldens (and
    a production backfill audit) diff against."""
    sig = _static_signals(docs)
    q_ok = _q_ok(sig).select(
        "doc_id", "q_ok"
    )
    per_doc = minhash_per_doc_frame(docs.select("doc_id", "text"))
    bands = _band_table(per_doc)
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    from data_ingestion_backend_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _verify_jaccard,
    )

    pairs = _verify_jaccard(per_doc, cand, JACCARD_THRESHOLD).select(
        "doc_a", "doc_b"
    )
    cc = connected_components(pairs.localCheckpoint(eager=True))
    labels = (
        docs.select("doc_id")
        .join(cc, "doc_id", "left")
        .select("doc_id", F.coalesce("lbl", "doc_id").alias("cluster_id"))
    )
    return corpus_build_frame(
        docs.select("doc_id", "lang", "text"), q_ok, labels
    )


@_register_standalone("prep_corpus_incremental", _corpus_oracle_sql())
def prep_corpus_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental build as a certified QUERY: the documents table
    arrives as three interleaved batches (doc_id mod 3) through
    ``extend_corpus_build`` into a throwaway warehouse, and the FINAL
    maintained decision table is returned — the oracle is the graded
    capstone's end-to-end SQL verbatim, because the maintenance contract
    IS bit-equality with the monolithic build.  This puts the
    incremental ≡ monolithic claim under the same cross-engine
    value-hash compare the driver runs, on top of the per-batch local
    goldens (tests/test_corpus_incremental.py).  Session-memoized (the
    dedup-family pattern): the 3-batch build runs once per session even
    when the oracle gate, the plan auditor, and the bench sweep all call
    the entry."""
    from data_ingestion_backend_spark.operators.dedup import _session_persisted

    def build() -> DataFrame:
        import shutil
        import tempfile

        from data_ingestion_backend_spark.sources.fixtures import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars", "text"
        )
        root = tempfile.mkdtemp(prefix="cbinc_")
        try:
            wh = Warehouse(spark, root)
            for i in range(3):
                extend_corpus_build(
                    wh, docs.filter(F.col("doc_id") % 3 == i), i
                )
            # pin the result off the parquet files before the dir goes
            return read_decisions(wh).localCheckpoint(eager=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    return _session_persisted(
        spark, sf_dir, "corpus_incremental_decisions", build
    ).orderBy("doc_id")


def attach_corpus_build_stream(
    wh: Warehouse, stream_df: DataFrame, checkpoint_dir: str
):
    """foreachBatch driver: each Structured Streaming epoch extends the
    build exactly once (the admission-stream wiring verbatim — epoch id
    keys the txn protocol, so restarts that redeliver are no-ops)."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda df, epoch: extend_corpus_build(wh, df, epoch)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
