"""Composed streaming corpus ADMISSION: the three maintained gates as
ONE exactly-once decision per micro-batch.

``neardup_gate_batch``, ``semantic_gate_batch``, and
``append_to_dsir_state`` each maintain their state incrementally with
their own exactly-once protocol; a real ingest pipeline runs them as
one decision — *admit* (text near-dup gate + embedding semantic gate
against the ADMITTED corpus), *score* (only admitted docs feed the DSIR
distributions), *append* (every state table advances together).  This
module is that composition:

- **one transactional domain**: a single intent record pins the base
  versions of ALL EIGHT tables (near-dup index/bands/pairs, semantic
  index/pairs/centroids, DSIR state, admissions ledger) and a single
  marker commits the batch — the crash-healing argument of the
  individual gates (re-run reads pinned bases, recomputes
  deterministically) carries over unchanged because every computation
  below is a pure function of (pinned bases, batch).  The first-batch
  centroid seed is STAGED into the same publish as everything else, so
  no table version from an uncommitted batch is ever visible.
- **one manifest publish**: all tables become visible together
  (``Warehouse.publish``), so a concurrent reader can never see a
  ledger row whose state absorption has not landed, or vice versa.
- **admitted-only absorption**: unlike the standalone gates (which
  absorb every doc and only EMIT pairs), the indexes here are the
  admitted corpus — rejected duplicates never pollute the band/cell
  tables, so gate cost stays proportional to the admitted set.

Admission rule (deterministic): a batch doc is rejected when it
near-dups an admitted-corpus doc, when it semantic-dups one
(cos ≥ SEM_THRESHOLD in its coarse cell), or when it duplicates a
LOWER-id doc of the same batch (the canonical-keep tie order).  The
ledger records (doc_id, batch_id, admitted, reason).

Scale shape: every stage is the certified incremental form — band-probe
candidates (never corpus×corpus), frozen-quantizer cell candidates,
mergeable integer DSIR histograms.  The batch is the only new work;
state reads are pinned snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.dedup import (
    _band_table,
    dedup_incremental_pairs,
    minhash_per_doc_frame,
)
from data_ingestion_backend_spark.operators.mlprep import (
    DSIR_STATE_TABLE,
    _dsir_state,
)
from data_ingestion_backend_spark.sources.warehouse import Warehouse
from data_ingestion_backend_spark.streaming import txn
from data_ingestion_backend_spark.streaming.neardup import (
    BANDS_TABLE,
    INDEX_TABLE,
    PAIRS_TABLE as ND_PAIRS_TABLE,
    _index_max_n,
    _write_index_stats,
)
from data_ingestion_backend_spark.streaming.semgate import (
    SEM_CENTROIDS_TABLE,
    SEM_INDEX_TABLE,
    SEM_PAIRS_TABLE,
    SEM_THRESHOLD,
    _centroids_at,
    _read_centroids,
    semantic_pairs_for_batch,
)
from data_ingestion_backend_spark.operators.similarity import (
    _assign_clusters,
    _train_centroids_sample,
)
from data_ingestion_backend_spark.plans.localtable import local_df

ADMISSIONS_TABLE = "admissions"


def last_admitted_batch(wh: Warehouse) -> int:
    return txn.last_batch(wh, ADMISSIONS_TABLE)


def admission_gate_batch(
    wh: Warehouse,
    batch: DataFrame,
    batch_id: int,
    sem_threshold: float = SEM_THRESHOLD,
) -> bool:
    """Process one (doc_id, lang, text, e) micro-batch: gate, score,
    append — exactly once.  Returns False on a re-delivered batch."""
    if batch_id <= last_admitted_batch(wh):
        return False
    bases = txn.begin_batch(
        wh,
        ADMISSIONS_TABLE,
        batch_id,
        {
            "nd_index": wh.current_version(INDEX_TABLE),
            "nd_bands": wh.current_version(BANDS_TABLE),
            "nd_pairs": wh.current_version(ND_PAIRS_TABLE),
            "sem_index": wh.current_version(SEM_INDEX_TABLE),
            "sem_pairs": wh.current_version(SEM_PAIRS_TABLE),
            "sem_cent": wh.current_version(SEM_CENTROIDS_TABLE),
            "dsir": wh.current_version(DSIR_STATE_TABLE),
            "adm": wh.current_version(ADMISSIONS_TABLE),
        },
        tables={
            "nd_index": INDEX_TABLE,
            "nd_bands": BANDS_TABLE,
            "nd_pairs": ND_PAIRS_TABLE,
            "sem_index": SEM_INDEX_TABLE,
            "sem_pairs": SEM_PAIRS_TABLE,
            "sem_cent": SEM_CENTROIDS_TABLE,
            "dsir": DSIR_STATE_TABLE,
            "adm": ADMISSIONS_TABLE,
        },
    )
    spark = batch.sparkSession
    batch = batch.localCheckpoint(eager=True)

    # An empty FIRST epoch (idle source at stream start) has no vectors
    # to seed the frozen quantizer from: commit the marker as a no-op
    # instead of handing a zero-row sample to the centroid trainer.  The
    # 'empty epoch is a committed no-op' contract thereby holds from
    # epoch 0, not just after a non-empty batch; the quantizer seeds on
    # the first batch that actually carries documents.
    if bases["sem_cent"] < 0 and batch.isEmpty():
        txn.commit_batch(wh, ADMISSIONS_TABLE, batch_id)
        return True

    # ----- near-dup gate (text) -------------------------------------------
    nd_corpus = wh.read(INDEX_TABLE, bases["nd_index"])
    nd_bands_corpus = (
        wh.read(BANDS_TABLE, bases["nd_bands"])
        if bases["nd_bands"] >= 0
        else _band_table(nd_corpus)
    )
    batch_per_doc = minhash_per_doc_frame(
        batch.select("doc_id", "text")
    ).localCheckpoint(eager=True)
    batch_bands = _band_table(batch_per_doc)
    batch_max_n = batch_per_doc.agg(F.max("n")).collect()[0][0] or 0
    max_n = max(batch_max_n, _index_max_n(wh, nd_corpus, bases["nd_index"]))
    nd_pairs = dedup_incremental_pairs(
        batch_per_doc, batch_bands, nd_bands_corpus, nd_corpus, max_n=max_n
    ).localCheckpoint(eager=True)

    # ----- semantic gate (embeddings) -------------------------------------
    sem_corpus = wh.read(SEM_INDEX_TABLE, bases["sem_index"])
    # the quantizer read is PINNED like every other base: a crash-replay
    # must see the centroids as of its intent, not the live pointer
    cent_base = bases["sem_cent"]
    seed_centroids = None
    if cent_base >= 0:
        C = (
            _read_centroids(wh)
            if wh.current_version(SEM_CENTROIDS_TABLE) == cent_base
            else _centroids_at(wh, cent_base)
        )
    else:
        # first batch seeds the frozen quantizer.  The seed is STAGED
        # into the same single-manifest publish as the other state
        # tables (r10 advisor finding): committing it early via
        # wh.write left a visible centroid version from a batch that
        # never committed, correct only while redelivery is bytewise
        # identical — staging removes that assumption.
        C = _train_centroids_sample(
            batch.select(F.col("doc_id").alias("vec_id"), "e")
        )
        seed_centroids = local_df(
            spark,
            [(i, row.tolist()) for i, row in enumerate(C)],
            "cluster long, centroid array<double>",
        )
    batch_assigned = _assign_clusters(
        batch.select(F.col("doc_id").alias("vec_id"), "e"), "e", C, 1
    ).localCheckpoint(eager=True)
    sem_pairs = semantic_pairs_for_batch(
        batch_assigned, sem_corpus, sem_threshold
    ).localCheckpoint(eager=True)

    # ----- the admission decision -----------------------------------------
    # a pair either touches the corpus (reject the batch side) or is
    # batch-internal with doc_a < doc_b (reject doc_b — keep-lowest-id,
    # the canonical tie order); sem pairs already orient new_id as the
    # rejected side
    bid = batch.select(F.col("doc_id").alias("bid"))
    b_in = nd_pairs.join(
        bid.withColumnRenamed("bid", "doc_b").withColumn("b_in", F.lit(True)),
        "doc_b",
        "left",
    )
    rej_nd = (
        b_in.select(
            F.when(F.col("b_in"), F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("doc_id")
        )
        .join(bid.withColumnRenamed("bid", "doc_id"), "doc_id")  # batch side only
        .distinct()
        .withColumn("nd", F.lit(True))
    )
    rej_sem = (
        sem_pairs.select(F.col("new_id").alias("doc_id"))
        .distinct()
        .withColumn("sem", F.lit(True))
    )
    reasons = F.filter(
        F.array(
            F.when(F.col("nd"), F.lit("near_dup")),
            F.when(F.col("sem"), F.lit("semantic_dup")),
        ),
        lambda x: x.isNotNull(),
    )
    ledger = (
        batch.select("doc_id")
        .join(rej_nd, "doc_id", "left")
        .join(rej_sem, "doc_id", "left")
        .select(
            "doc_id",
            F.lit(int(batch_id)).alias("batch_id"),
            (F.size(reasons) == 0).alias("admitted"),
            F.concat_ws(",", reasons).alias("reason"),
        )
        .localCheckpoint(eager=True)
    )
    adm_ids = ledger.filter("admitted").select("doc_id")

    # ----- admitted-only state appends, ONE manifest ----------------------
    adm_docs = batch.join(adm_ids, "doc_id")
    dsir_batch = _dsir_state(
        adm_docs.select("text"),
        adm_docs.filter(F.col("lang") == "en").select("text"),
    )
    dsir_base = wh.read(DSIR_STATE_TABLE, bases["dsir"])
    dsir_merged = (
        dsir_base.unionByName(dsir_batch)
        .groupBy("side", "b")
        .agg(F.sum("k").cast("bigint").alias("k"))
    )
    # The five grow-only tables stage as FILE-LEVEL appends (base files
    # hard-linked, only the batch's delta written): without this, each
    # batch rewrites the accumulated index, and the per-batch gate cost
    # tracks the CORPUS — at a 100×-grown index the rewrite is the
    # dominant term (the grown-soak arm in tools/corpussoak.py measures
    # exactly this claim).  BANDS keeps the union-rewrite form on the
    # one legacy path where its base is synthesized from the index
    # rather than persisted.
    staged = {
        INDEX_TABLE: wh.stage_append(
            INDEX_TABLE,
            batch_per_doc.join(adm_ids, "doc_id"),
            bases["nd_index"],
        ),
        BANDS_TABLE: (
            wh.stage_append(
                BANDS_TABLE,
                batch_bands.join(adm_ids, "doc_id"),
                bases["nd_bands"],
            )
            if bases["nd_bands"] >= 0 or bases["nd_index"] < 0
            else wh.stage(  # pre-bands warehouse: base only exists derived
                BANDS_TABLE,
                nd_bands_corpus.unionByName(batch_bands.join(adm_ids, "doc_id")),
            )
        ),
        ND_PAIRS_TABLE: wh.stage_append(
            ND_PAIRS_TABLE, nd_pairs, bases["nd_pairs"]
        ),
        SEM_INDEX_TABLE: wh.stage_append(
            SEM_INDEX_TABLE,
            batch_assigned.join(
                adm_ids.withColumnRenamed("doc_id", "vec_id"), "vec_id"
            ),
            bases["sem_index"],
        ),
        SEM_PAIRS_TABLE: wh.stage_append(
            SEM_PAIRS_TABLE, sem_pairs, bases["sem_pairs"]
        ),
        DSIR_STATE_TABLE: wh.stage(DSIR_STATE_TABLE, dsir_merged),
        ADMISSIONS_TABLE: wh.stage_append(ADMISSIONS_TABLE, ledger, bases["adm"]),
    }
    if seed_centroids is not None:
        staged[SEM_CENTROIDS_TABLE] = wh.stage(
            SEM_CENTROIDS_TABLE, seed_centroids
        )
    wh.publish(staged)
    _write_index_stats(wh, staged[INDEX_TABLE], max_n)
    txn.commit_batch(wh, ADMISSIONS_TABLE, batch_id)
    compact_admission_state(wh)
    return True


def compact_admission_state(wh: Warehouse, max_files: int = 64) -> list[str]:
    """Scheduled compaction across ALL the composed gate's maintained
    tables (the `compact_neardup_state` contract: post-commit trigger,
    equal-state atomic rewrite, bounded reader file counts; the max-n
    sidecar re-keyed scan-free when the index itself compacts)."""
    from data_ingestion_backend_spark.streaming.neardup import (
        _index_max_n,
        _write_index_stats as _wis,
    )

    done = []
    for t in (
        INDEX_TABLE,
        BANDS_TABLE,
        ND_PAIRS_TABLE,
        SEM_INDEX_TABLE,
        SEM_PAIRS_TABLE,
        ADMISSIONS_TABLE,
    ):
        prev = wh.current_version(t)
        v = wh.compact_if_needed(t, max_files=max_files)
        if v is not None:
            done.append(t)
            if t == INDEX_TABLE:
                _wis(wh, v, _index_max_n(wh, wh.read(t, v), prev))
    return done


def admission_one_shot(
    wh: Warehouse, batches: list[DataFrame], sem_threshold: float = SEM_THRESHOLD
) -> None:
    """Reference composition for the streamed ≡ one-shot golden: the
    same batches through the same gate, sequentially, batch ids 1..n."""
    for i, b in enumerate(batches, start=1):
        admission_gate_batch(wh, b, i, sem_threshold)


def attach_admission_stream(
    wh: Warehouse, stream_df: DataFrame, checkpoint_dir: str, **kwargs
):
    """foreachBatch driver: Structured Streaming supplies (batch_df,
    epoch_id); the epoch id keys the exactly-once protocol so a restart
    that redelivers an epoch is a no-op."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda df, epoch: admission_gate_batch(wh, df, epoch, **kwargs)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
