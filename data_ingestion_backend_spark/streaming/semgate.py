"""Streaming SEMANTIC admission gate: micro-batches of embeddings probe
the persisted IVF-cell index for near-duplicates by cosine.

The embedding-modality twin of :mod:`streaming.neardup` (which answers
"is this a textual near-duplicate"): each arriving micro-batch of
vectors is (a) cell-assigned with the index's FROZEN coarse quantizer
(one Arrow GEMM pass over the batch only), (b) probed against the
same-cell corpus slice for pairs with cosine ≥ the semantic threshold
(batch×corpus ∪ batch×batch, never corpus×corpus), and (c) absorbed
into the index so the next batch sees it.  This is the continuous form
of ``similarity.semantic_dedup``'s candidate structure, with the
incremental-index discipline of ``similarity.append_to_ivf_index``.

Exactly-once reuses the shared three-guard commit (``streaming/txn.py``):
stream checkpoint, last-admitted batch marker, and a pre-write intent
pinning the pre-batch snapshot versions — a re-delivered batch after any
crash point rebuilds from the pinned bases, never from a half-advanced
pointer.  The quantizer table is written once at seed and never mutated
by the gate, so it needs no base pinning.

Scale notes: per-batch cost is one |batch|-sized GEMM + a cell-equi join
whose corpus side is cell-pruned (the cell column is the join key; the
persisted form at 100 TB is hive-partitioned by cell exactly like
``build_ivf_index``).  The corpus is never re-assigned.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.dedup import cosine_expr
from data_ingestion_backend_spark.operators.similarity import (
    _assign_clusters,
    _train_centroids_sample,
)
from data_ingestion_backend_spark.sources.warehouse import Warehouse
from data_ingestion_backend_spark.streaming import txn
from data_ingestion_backend_spark.plans.localtable import local_df

SEM_INDEX_TABLE = "semdup_index"
SEM_PAIRS_TABLE = "semdup_pairs"
SEM_CENTROIDS_TABLE = "semdup_centroids"

#: admission threshold: same-cell pairs at or above this cosine are
#: reported as semantic duplicates.
SEM_THRESHOLD = 0.95


def last_admitted_batch(wh: Warehouse) -> int:
    return txn.last_batch(wh, SEM_PAIRS_TABLE)


#: per-warehouse centroid memo keyed by the live Warehouse object (the
#: catalog view-memo pattern): the quantizer is frozen after seeding, so
#: a steady-state micro-batch pays one manifest version check instead of
#: a collect action.  Invalidation is by table version — a re-seed (new
#: version) refreshes the cache on the next batch.
_CENTROID_MEMO: "weakref.WeakKeyDictionary[Warehouse, tuple[int, object]]" = (
    weakref.WeakKeyDictionary()
)


def _read_centroids(wh: Warehouse):
    import numpy as np

    v = wh.current_version(SEM_CENTROIDS_TABLE)
    hit = _CENTROID_MEMO.get(wh)
    if hit is not None and hit[0] == v:
        return hit[1]
    if v < 0:
        return np.zeros((0, 0), dtype=np.float64)
    rows = wh.read(SEM_CENTROIDS_TABLE, v).orderBy("cluster").collect()
    C = np.asarray([r["centroid"] for r in rows], dtype=np.float64)
    # The memo hands the SAME array to every micro-batch; freeze it so an
    # in-place mutation by a caller raises instead of silently corrupting
    # the quantizer for the rest of the stream.
    C.flags.writeable = False
    _CENTROID_MEMO[wh] = (v, C)
    return C


def _centroids_at(wh: Warehouse, version: int):
    """Pinned-version centroid read for crash-replay paths: a re-run
    rebuilding from intent bases must see the quantizer AS OF its
    pinned version, not whatever the live pointer says (the memo above
    serves the steady-state current-version read)."""
    import numpy as np

    if version < 0:
        return np.zeros((0, 0), dtype=np.float64)
    rows = wh.read(SEM_CENTROIDS_TABLE, version).orderBy("cluster").collect()
    C = np.asarray([r["centroid"] for r in rows], dtype=np.float64)
    C.flags.writeable = False
    return C


def seed_semantic_index(wh: Warehouse, corpus_emb: DataFrame) -> None:
    """Build the initial index from a static (vec_id, e) frame: train the
    coarse quantizer on the deterministic sample, assign every corpus
    vector once, persist (index, centroids)."""
    spark = corpus_emb.sparkSession
    C = _train_centroids_sample(corpus_emb)
    assigned = _assign_clusters(corpus_emb.select("vec_id", "e"), "e", C, 1)
    wh.publish(
        {
            SEM_INDEX_TABLE: wh.stage(SEM_INDEX_TABLE, assigned),
            SEM_CENTROIDS_TABLE: wh.stage(
                SEM_CENTROIDS_TABLE,
                local_df(
                    spark,
                    [(i, row.tolist()) for i, row in enumerate(C)],
                    "cluster long, centroid array<double>",
                ),
            ),
        }
    )


def semantic_pairs_for_batch(
    batch_assigned: DataFrame,
    corpus: DataFrame,
    threshold: float = SEM_THRESHOLD,
) -> DataFrame:
    """Pure pair computation (no warehouse I/O — the unit the goldens
    replay): same-cell candidates new×corpus plus new×new (once, by
    id order), cosine-verified at ``threshold``."""
    pool = corpus.select("vec_id", "e", "cluster").withColumn(
        "is_new", F.lit(False)
    ).unionByName(
        batch_assigned.select("vec_id", "e", "cluster").withColumn(
            "is_new", F.lit(True)
        )
    )
    n = batch_assigned.select(
        F.col("cluster"),
        F.col("vec_id").alias("new_id"),
        F.col("e").alias("ne"),
    )
    o = pool.select(
        F.col("cluster"),
        F.col("vec_id").alias("old_id"),
        F.col("e").alias("oe"),
        "is_new",
    )
    cos = cosine_expr(F.col("ne"), F.col("oe"))
    return (
        n.join(o, "cluster")
        .filter(
            (F.col("old_id") != F.col("new_id"))
            & (~F.col("is_new") | (F.col("old_id") < F.col("new_id")))
        )
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("new_id", "old_id", "cosine")
    )


def semantic_gate_batch(
    wh: Warehouse,
    batch_emb: DataFrame,
    batch_id: int,
    threshold: float = SEM_THRESHOLD,
) -> bool:
    """Process one micro-batch exactly once: emit its semantic-dup pairs
    and absorb it into the index.  Returns False on a re-delivered
    ``batch_id`` that already committed; a crash between table writes is
    healed by the intent's pinned base versions (same protocol as the
    near-dup gate, ``streaming/neardup.py``)."""
    if batch_id <= last_admitted_batch(wh):
        return False
    bases = txn.begin_batch(
        wh,
        SEM_PAIRS_TABLE,
        batch_id,
        {
            "pairs": wh.current_version(SEM_PAIRS_TABLE),
            "index": wh.current_version(SEM_INDEX_TABLE),
        },
        tables={"pairs": SEM_PAIRS_TABLE, "index": SEM_INDEX_TABLE},
    )
    pairs_base, index_base = bases["pairs"], bases["index"]
    corpus = wh.read(SEM_INDEX_TABLE, index_base)
    C = _read_centroids(wh)
    if len(C) == 0:
        # never-seeded warehouse: train the quantizer from the first
        # batch itself (deterministic sample → deterministic centroids,
        # so a crash between this write and the marker is harmless — the
        # re-run reads back the identical table)
        C = _train_centroids_sample(batch_emb)
        wh.write(
            SEM_CENTROIDS_TABLE,
            local_df(
                batch_emb.sparkSession,
                [(i, row.tolist()) for i, row in enumerate(C)],
                "cluster long, centroid array<double>",
            ),
        )
    batch_assigned = _assign_clusters(
        batch_emb.select("vec_id", "e"), "e", C, 1
    ).localCheckpoint(eager=True)
    pairs = semantic_pairs_for_batch(batch_assigned, corpus, threshold)
    # stage both tables, publish ONE manifest: a concurrent reader can
    # never see pairs for a batch the index has not absorbed (the same
    # cross-table atomicity ingest_file and cascade delete ride)
    # both tables grow-only → file-level appends (base hard-linked, only
    # the batch delta written): O(batch) per-batch write cost
    pairs_v = wh.stage_append(SEM_PAIRS_TABLE, pairs, pairs_base)
    index_v = wh.stage_append(SEM_INDEX_TABLE, batch_assigned, index_base)
    wh.publish({SEM_PAIRS_TABLE: pairs_v, SEM_INDEX_TABLE: index_v})
    txn.commit_batch(wh, SEM_PAIRS_TABLE, batch_id)
    compact_semantic_state(wh)
    return True


def compact_semantic_state(wh: Warehouse, max_files: int = 64) -> list[str]:
    """Scheduled compaction for the gate's append-maintained tables
    (the neardup `compact_neardup_state` contract: post-commit trigger,
    equal-state atomic rewrite, bounded reader file counts)."""
    done = []
    for t in (SEM_PAIRS_TABLE, SEM_INDEX_TABLE):
        if wh.compact_if_needed(t, max_files=max_files) is not None:
            done.append(t)
    return done


def maintain_semantic_pairs(
    spark: SparkSession,
    wh: Warehouse,
    vec_dir: str,
    checkpoint_dir: str,
    schema=None,
) -> None:
    """Drain the arriving-vectors directory through the semantic gate
    (availableNow semantics — same code path as continuous operation)."""
    if schema is None:
        schema = spark.read.parquet(vec_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(vec_dir)
    )
    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda batch_df, batch_id: semantic_gate_batch(wh, batch_df, batch_id)
        )
        .start()
    )
    q.awaitTermination()
