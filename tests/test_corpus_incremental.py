"""Incremental corpus build (operators/corpus_incremental.py): the
maintained decision table must be BIT-EQUAL to the monolithic rebuild
after every batch, exactly once under the shared txn protocol."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.corpus import prep_corpus_e2e
from data_ingestion_backend_spark.operators.corpus_incremental import (
    CB_CHANGELOG,
    CB_DECISIONS,
    CB_SURV,
    DECISION_COLS,
    corpus_build_monolithic,
    extend_corpus_build,
    gram_df_state,
    last_built_batch,
    read_decisions,
)
from data_ingestion_backend_spark.sources.warehouse import Warehouse
from tests.conftest import SF_DIR_SMALL


#: doc_id split points: three uneven batches of the sf0.001 documents
#: fixture (500 docs) — the LAST prefix is the whole fixture, so the
#: final equality can ALSO run against the graded prep_corpus_e2e cert.
BATCH_BOUNDS = [(0, 200), (200, 350), (350, 500)]


def _docs(spark):
    from data_ingestion_backend_spark.sources.fixtures import load_table

    return load_table(spark, SF_DIR_SMALL, "documents").select(
        "doc_id", "lang", "source", "n_chars", "text"
    )


def _batch(spark, lo, hi):
    return _docs(spark).filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    """Run the three batches once; the equality tests read the results."""
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("cbwh")))
    snapshots = []
    for i, (lo, hi) in enumerate(BATCH_BOUNDS):
        assert extend_corpus_build(wh, _batch(spark, lo, hi), i) is True
        snapshots.append(_rows(read_decisions(wh)))
    return wh, snapshots


def test_incremental_equals_monolithic_after_every_batch(spark, built):
    """The core contract: after EACH batch the maintained decision table
    is bit-equal to a monolithic rebuild over the accumulated prefix —
    canonical-keep displacement, span-state flips, λ drift, budget-line
    movement and split re-keying all included."""
    _, snapshots = built
    for i, (lo, hi) in enumerate(BATCH_BOUNDS):
        prefix = _docs(spark).filter(F.col("doc_id") < hi)
        want = _rows(corpus_build_monolithic(prefix))
        assert snapshots[i] == want, f"batch {i} diverged from monolithic"


def test_final_state_equals_graded_capstone(spark, built):
    """After the last batch the accumulated corpus IS the fixture, so
    the maintained table must equal the driver-graded prep_corpus_e2e
    — the independent composition over the same data."""
    _, snapshots = built
    want = _rows(prep_corpus_e2e(spark, SF_DIR_SMALL))
    assert snapshots[-1] == want


def test_span_state_matches_full_recount(spark, built):
    """The maintained (g, df) span state equals a from-scratch recount
    over the final survivor set — the one delta mechanism with no
    certified precedent gets its own differential."""
    from data_ingestion_backend_spark.operators.dedup import span_gram_table

    wh, _ = built
    surv_docs = (
        _docs(spark)
        .join(wh.read(CB_SURV).select("doc_id"), "doc_id")
        .select("doc_id", "text")
    )
    want = _rows(
        span_gram_table(surv_docs)
        .select("g", "doc_id")
        .distinct()
        .groupBy("g")
        .agg(F.count("*").cast("bigint").alias("df"))
    )
    assert _rows(gram_df_state(wh)) == want


def test_redelivered_batch_is_noop(spark, built):
    wh, snapshots = built
    assert last_built_batch(wh) == len(BATCH_BOUNDS) - 1
    v = wh.current_version(CB_DECISIONS)
    # same id, any content — rejected before any state read
    assert extend_corpus_build(wh, _batch(spark, 0, 10), 1) is False
    assert wh.current_version(CB_DECISIONS) == v
    assert _rows(read_decisions(wh)) == snapshots[-1]


def test_streamed_build_equals_direct(spark, tmp_path):
    """The Structured Streaming wiring (`attach_corpus_build_stream`):
    the same three batches arriving as files through foreachBatch must
    leave the identical decision table as direct sequential extends —
    epoch ids key the txn protocol, so the stream inherits exactly-once."""
    import os

    from data_ingestion_backend_spark.operators.corpus_incremental import (
        attach_corpus_build_stream,
    )

    wh_ref = Warehouse(spark, str(tmp_path / "wh_ref"))
    for i, (lo, hi) in enumerate(BATCH_BOUNDS):
        assert extend_corpus_build(wh_ref, _batch(spark, lo, hi), i) is True

    sdir = str(tmp_path / "doc_stream")
    os.makedirs(sdir)
    base_ts = 1_600_000_000  # stamped mtimes: deterministic source order
    for i, (lo, hi) in enumerate(BATCH_BOUNDS):
        stage = str(tmp_path / f"stage_{i}")
        _batch(spark, lo, hi).coalesce(1).write.mode("overwrite").parquet(stage)
        [part] = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        dst = os.path.join(sdir, f"batch-{i:04d}.parquet")
        os.replace(os.path.join(stage, part), dst)
        os.utime(dst, (base_ts + i, base_ts + i))
    stream = (
        spark.readStream.schema(
            "doc_id bigint, lang string, source string, n_chars bigint, text string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(sdir)
    )
    wh = Warehouse(spark, str(tmp_path / "wh_stream"))
    q = attach_corpus_build_stream(wh, stream, str(tmp_path / "ckpt"))
    q.awaitTermination()
    assert last_built_batch(wh) == len(BATCH_BOUNDS) - 1
    assert _rows(read_decisions(wh)) == _rows(read_decisions(wh_ref))


def test_empty_batch_is_a_committed_noop(spark, tmp_path):
    """Streams deliver empty epochs (idle source, filtered batch); the
    build must absorb one as a batch that changes NO decision while
    still committing its marker (exactly-once bookkeeping advances)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    assert extend_corpus_build(wh, _batch(spark, 0, 200), 0) is True
    before = _rows(read_decisions(wh))
    assert extend_corpus_build(wh, _batch(spark, 0, 0), 1) is True
    assert last_built_batch(wh) == 1
    assert _rows(read_decisions(wh)) == before
    # and the build continues normally past it
    assert extend_corpus_build(wh, _batch(spark, 200, 350), 2) is True
    want = _rows(
        corpus_build_monolithic(_docs(spark).filter(F.col("doc_id") < 350))
    )
    assert _rows(read_decisions(wh)) == want


def test_crash_before_marker_heals_from_pinned_bases(
    spark, tmp_path, monkeypatch
):
    """A crash after the publish but before the marker re-runs the batch
    from the intent-pinned bases — the healed final table still equals
    the monolithic rebuild."""
    from data_ingestion_backend_spark.streaming import txn

    wh = Warehouse(spark, str(tmp_path / "wh"))
    assert extend_corpus_build(wh, _batch(spark, 0, 200), 0) is True

    class Boom(RuntimeError):
        pass

    real_write_atomic = txn.write_atomic

    def crash_on_marker(path, payload):
        if path.endswith("_last_batch"):
            raise Boom("simulated crash before marker write")
        real_write_atomic(path, payload)

    monkeypatch.setattr(txn, "write_atomic", crash_on_marker)
    try:
        extend_corpus_build(wh, _batch(spark, 200, 350), 1)
    except Boom:
        pass
    monkeypatch.setattr(txn, "write_atomic", real_write_atomic)

    assert last_built_batch(wh) == 0  # marker missing: hazard window live
    assert extend_corpus_build(wh, _batch(spark, 200, 350), 1) is True
    want = _rows(
        corpus_build_monolithic(_docs(spark).filter(F.col("doc_id") < 350))
    )
    assert _rows(read_decisions(wh)) == want


def test_change_log_replay_reconstructs_decisions(spark, built):
    """cb_decision_log is the CDC product: one row per decision the
    batch created or flipped, full new row + old_stage.  Latest-batch-
    wins replay over the log must reconstruct the maintained table
    exactly — a consumer can tail the log instead of re-reading."""
    from pyspark.sql import Window

    wh, snapshots = built
    log = wh.read(CB_CHANGELOG)
    w = Window.partitionBy("doc_id").orderBy(F.desc("batch_id"))
    replayed = (
        log.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("doc_id", *DECISION_COLS)
    )
    assert _rows(replayed) == snapshots[-1]
    # first appearance of each doc logs old_stage = NULL (a creation)
    first = (
        log.withColumn("rn", F.row_number().over(
            Window.partitionBy("doc_id").orderBy("batch_id")
        ))
        .filter("rn = 1")
    )
    assert first.filter(F.col("old_stage").isNotNull()).count() == 0


def test_unflipped_label_buckets_are_linked_not_rewritten(spark, tmp_path):
    """The write-bounding claim, physically: a doc-id bucket none of the
    batch's label flips touched must arrive in the next cb_labels
    version as the SAME inode (a hard link), not a rewrite.  Two
    batches in disjoint 1024-wide doc-id buckets with disjoint texts
    produce zero cross-batch flips, so batch 1 must carry batch 0's
    bucket by link for every mutable per-doc table."""
    import os

    from data_ingestion_backend_spark.operators.corpus_incremental import (
        CB_CLEAN,
        CB_DOC_BUCKETS,
        CB_LABELS,
        CB_SURV,
    )

    def _mk(lo):
        # stopwords vote lang_pred='en' (KNOWN_LANGS gate); the unique
        # tail keeps every doc its own near-dup cluster; a PER-BATCH
        # source keeps the rank-based length band of earlier batches
        # untouched (per-source percentiles)
        rows = [
            (
                lo + i,
                "en",
                f"s{lo}",
                60,
                "the and of to in "
                + " ".join(f"w{lo + i}x{c}" for c in "abcdefghij"),
            )
            for i in range(40)
        ]
        return spark.createDataFrame(
            rows, "doc_id long, lang string, source string, n_chars long, text string"
        )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    assert extend_corpus_build(wh, _mk(0), 0) is True          # pb=0
    assert extend_corpus_build(wh, _mk(10 * 1024), 1) is True  # pb=10
    for table in (CB_LABELS, CB_SURV, CB_CLEAN, CB_DOC_BUCKETS):
        v_cur = wh.current_version(table)
        pdir = os.path.join(wh._version_path(table, v_cur - 1), "pb=0")
        cdir = os.path.join(wh._version_path(table, v_cur), "pb=0")
        prev_inodes = {
            os.stat(os.path.join(pdir, f)).st_ino
            for f in os.listdir(pdir)
            if not f.startswith(("_", "."))
        }
        cur_inodes = {
            os.stat(os.path.join(cdir, f)).st_ino
            for f in os.listdir(cdir)
            if not f.startswith(("_", "."))
        }
        assert prev_inodes and prev_inodes <= cur_inodes, (
            f"{table} pb=0 was rewritten, not linked"
        )
    # and the maintained result still equals the monolithic rebuild
    want = _rows(corpus_build_monolithic(_mk(0).unionByName(_mk(10 * 1024))))
    assert _rows(read_decisions(wh)) == want


def test_corpus_max_n_comes_from_pinned_sidecar_not_a_scan(spark, built):
    """The monotone max-shingle scalar is maintained in the stats
    sidecar at publish: when the sidecar matches the pinned signature
    version, `_cb_max_n` must return it WITHOUT touching the frame —
    killing the per-batch O(corpus) scan of cb_minhash.  A poisoned
    frame object proves the data path is never consulted."""
    from data_ingestion_backend_spark.operators.corpus_incremental import (
        CB_MINHASH,
        _cb_max_n,
    )

    wh, _ = built

    class Poison:
        def agg(self, *_a, **_k):  # pragma: no cover - the assertion
            raise AssertionError("sidecar hit must not scan the frame")

    v = wh.current_version(CB_MINHASH)
    got = _cb_max_n(wh, Poison(), v)
    want = wh.read(CB_MINHASH).agg(F.max("n")).collect()[0][0]
    assert got == want
    # a version mismatch (crash replay pinned behind the stats) falls
    # back to scanning the PINNED frame
    assert _cb_max_n(wh, wh.read(CB_MINHASH, v), v - 1) == want


def test_forced_compaction_every_batch_preserves_equality(
    spark, tmp_path, monkeypatch
):
    """The compaction trigger under maximum pressure: threshold 0 makes
    every state table compact after EVERY commit — appends must resume
    on compacted bases (including the max-n sidecar re-key and the
    gram-df log fold) and the maintained table must still be bit-equal
    to the monolithic rebuild, with reader file counts bounded."""
    import data_ingestion_backend_spark.operators.corpus_incremental as ci

    monkeypatch.setattr(ci, "COMPACT_MAX_FILES", 0)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    for i, (lo, hi) in enumerate(BATCH_BOUNDS):
        assert extend_corpus_build(wh, _batch(spark, lo, hi), i) is True
    want = _rows(corpus_build_monolithic(_docs(spark)))
    assert _rows(read_decisions(wh)) == want
    # every table's reader file count is back at snapshot sizing
    from data_ingestion_backend_spark.operators.corpus_incremental import (
        _ALL_TABLES,
    )

    for t in _ALL_TABLES:
        assert wh.data_file_count(t) <= 16, f"{t} not compacted"
    # the gram-df log folded to one row per gram (state unchanged —
    # the monolithic equality above already proves the sums)
    from data_ingestion_backend_spark.operators.corpus_incremental import (
        CB_GRAM_DF,
    )

    log_rows = wh.read(CB_GRAM_DF).count()
    assert log_rows == gram_df_state(wh).count()


def test_compact_under_live_intent_heals(spark, tmp_path, monkeypatch):
    """Compaction between a crashed publish and its replay must not
    break exactly-once: the intent's pinned bases still exist (vacuum
    hasn't run), the replay re-runs from them, and the healed table
    equals the monolithic rebuild."""
    from data_ingestion_backend_spark.operators.corpus_incremental import (
        maintain_corpus_build,
    )
    from data_ingestion_backend_spark.streaming import txn

    wh = Warehouse(spark, str(tmp_path / "wh"))
    assert extend_corpus_build(wh, _batch(spark, 0, 200), 0) is True

    class Boom(RuntimeError):
        pass

    real_write_atomic = txn.write_atomic

    def crash_on_marker(path, payload):
        if path.endswith("_last_batch"):
            raise Boom("simulated crash before marker write")
        real_write_atomic(path, payload)

    monkeypatch.setattr(txn, "write_atomic", crash_on_marker)
    try:
        extend_corpus_build(wh, _batch(spark, 200, 350), 1)
    except Boom:
        pass
    monkeypatch.setattr(txn, "write_atomic", real_write_atomic)
    assert last_built_batch(wh) == 0  # intent live, marker missing
    # maintenance fires while the intent is live (threshold 0: compact
    # everything) — then the batch is redelivered and must heal
    compacted = maintain_corpus_build(wh, max_files=0)
    assert compacted  # something actually compacted
    assert extend_corpus_build(wh, _batch(spark, 200, 350), 1) is True
    want = _rows(
        corpus_build_monolithic(_docs(spark).filter(F.col("doc_id") < 350))
    )
    assert _rows(read_decisions(wh)) == want


def test_vacuum_never_removes_intent_pinned_bases(spark, tmp_path, monkeypatch):
    """A crash after publish but before the marker leaves a live intent
    pinning the pre-batch base versions; an aggressive vacuum in that
    window must KEEP the pinned versions so the redelivered batch still
    heals from them (vacuum honors `_intent_pinned_versions`)."""
    from data_ingestion_backend_spark.operators.corpus_incremental import (
        _ALL_TABLES,
    )
    from data_ingestion_backend_spark.streaming import txn

    wh = Warehouse(spark, str(tmp_path / "wh"))
    assert extend_corpus_build(wh, _batch(spark, 0, 200), 0) is True
    assert extend_corpus_build(wh, _batch(spark, 200, 350), 1) is True

    class Boom(RuntimeError):
        pass

    real_write_atomic = txn.write_atomic

    def crash_on_marker(path, payload):
        if path.endswith("_last_batch"):
            raise Boom("simulated crash before marker write")
        real_write_atomic(path, payload)

    monkeypatch.setattr(txn, "write_atomic", crash_on_marker)
    try:
        extend_corpus_build(wh, _batch(spark, 350, 500), 2)
    except Boom:
        pass
    monkeypatch.setattr(txn, "write_atomic", real_write_atomic)
    assert last_built_batch(wh) == 1  # intent live for batch 2

    # aggressive vacuum inside the hazard window: keep=1 would remove
    # every pre-crash version without the pin guard
    import os

    for t in _ALL_TABLES:
        wh.vacuum(t, keep=1)
    pinned = wh._intent_pinned_versions(CB_DECISIONS)
    assert pinned, "intent should pin the decision base"
    for v in pinned:
        assert os.path.isdir(wh._version_path(CB_DECISIONS, v))

    # the redelivered batch heals to the monolithic truth
    assert extend_corpus_build(wh, _batch(spark, 350, 500), 2) is True
    want = _rows(corpus_build_monolithic(_docs(spark)))
    assert _rows(read_decisions(wh)) == want


def test_docs_compaction_links_cold_leaf_text_unread(spark, tmp_path, monkeypatch):
    """The r12 advice finding, closed: maintenance must never re-pay the
    whole raw corpus text.  cb_docs is hive-partitioned on the doc-id
    bucket (r13) and compacts per HOT LEAF: with an arrival-ordered
    build, only the newest buckets accumulate append file sets, so a
    fired compaction rewrites text bounded by those leaves while every
    cold leaf's text files arrive in the new version as the SAME inode
    (linked, never read) — and the decision table still equals the
    monolithic rebuild."""
    import os

    import data_ingestion_backend_spark.operators.corpus_incremental as ci

    monkeypatch.setattr(ci, "CB_PART_RANGE", 64)  # fixture spans ~8 leaves
    wh = Warehouse(spark, str(tmp_path / "wh"))
    for i, (lo, hi) in enumerate(BATCH_BOUNDS):
        assert ci.extend_corpus_build(wh, _batch(spark, lo, hi), i) is True
    v = wh.current_version(ci.CB_DOCS)
    path = wh._version_path(ci.CB_DOCS, v)

    def leaf_files(root, leaf):
        d = os.path.join(root, f"pb={leaf}")
        return sorted(
            os.path.join(dp, f)
            for dp, _d, fs in os.walk(d)
            for f in fs
            if not f.startswith(("_", "."))
        )

    # early buckets were written once (batch 0) and never touched again
    cold = leaf_files(path, 0) + leaf_files(path, 1)
    assert cold
    # the boundary bucket doc_id≈192..320 got file-appends from batch 1
    assert len(leaf_files(path, 3)) > 1
    compacted = ci.maintain_corpus_build(wh, max_files=1)
    assert ci.CB_DOCS in compacted
    new_path = wh._version_path(ci.CB_DOCS, wh.current_version(ci.CB_DOCS))
    new_inodes = {
        os.stat(os.path.join(dp, f)).st_ino
        for dp, _d, fs in os.walk(new_path)
        for f in fs
        if not f.startswith(("_", "."))
    }
    for p in cold:  # cold-leaf text re-linked, unread
        assert os.stat(p).st_ino in new_inodes
        assert os.stat(p).st_nlink >= 2
    # the hot leaf collapsed
    assert len(leaf_files(new_path, 3)) == 1
    want = _rows(corpus_build_monolithic(_docs(spark)))
    assert _rows(read_decisions(wh)) == want


def test_lam_py_matches_dsir_lambda_over_count_grid(spark):
    """`_lam_py` (the driver-side twin that lets λ old/new evaluate
    without a Spark job) must be bit-equal to `mlprep._dsir_lambda`'s
    SQL arithmetic — pinned over a grid spanning both CASE branches,
    ct-absent buckets, and large-count ratios."""
    from data_ingestion_backend_spark.operators.corpus_incremental import (
        _lam_py,
    )
    from data_ingestion_backend_spark.operators.mlprep import _dsir_lambda

    grid = []
    vals = [0, 1, 2, 3, 7, 50, 1000, 123456]
    for cs in vals[1:]:  # cs >= 1 (src rows exist by construction)
        for ct in vals:
            grid.append((cs, ct))
    totals = [(100, 30), (7868, 2691), (10**7, 10**6), (5, 5)]
    for ts, tt in totals:
        src = spark.createDataFrame(
            [(i, cs) for i, (cs, _ct) in enumerate(grid)], "b bigint, cs bigint"
        )
        tgt = spark.createDataFrame(
            [(i, ct) for i, (_cs, ct) in enumerate(grid) if ct > 0],
            "b bigint, ct bigint",
        )
        ref = {
            r["b"]: r["lam"] for r in _dsir_lambda(src, tgt, ts, tt).collect()
        }
        for i, (cs, ct) in enumerate(grid):
            assert _lam_py(cs, ct, ts, tt) == ref[i], (cs, ct, ts, tt)


def test_tie_heavy_lengths_match_monolithic(spark, tmp_path):
    """Cut-pair order statistics under stress: many docs SHARE n_chars
    values (the rank boundary lands inside tie groups, where the
    doc_id tie-break decides), single-doc and two-doc sources, and a
    source whose keep band APPEARS between batches — the maintained
    row-local length filter must still reproduce the percent_rank
    window bit-for-bit through the full build."""
    rows = []
    # source A: 40 docs over only 5 distinct lengths (heavy ties)
    for i in range(40):
        rows.append((i, "en", "A", 100 + (i % 5), "tie doc " + " ".join(f"a{i}w{j}" for j in range(12))))
    # source B: single doc (empty band: percent_rank 0 fails >= 0.05)
    rows.append((100, "en", "B", 50, "lone doc " + " ".join(f"b{j}" for j in range(12))))
    # source C: starts with 1 doc, grows to 3 (band appears mid-build)
    rows.append((200, "de", "C", 70, "c first " + " ".join(f"c0w{j}" for j in range(12))))
    rows.append((201, "de", "C", 71, "c second " + " ".join(f"c1w{j}" for j in range(12))))
    rows.append((202, "de", "C", 69, "c third " + " ".join(f"c2w{j}" for j in range(12))))
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long, text string"
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    bounds = [(0, 20), (20, 201), (201, 1000)]
    for i, (lo, hi) in enumerate(bounds):
        b = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        assert extend_corpus_build(wh, b, i) is True
        prefix = docs.filter(F.col("doc_id") < hi)
        want = _rows(corpus_build_monolithic(prefix))
        assert _rows(read_decisions(wh)) == want, f"batch {i} diverged"


def _mono_packs(spark, docs, eos=" <eos> "):
    """Full re-materialization comparator: materialize_corpus_build's
    pack aggregation over the monolithic decision table."""
    from data_ingestion_backend_spark.operators.dedup import (
        substring_cut_tokens_frame,
    )
    from data_ingestion_backend_spark.operators.mlprep import PACK_SHARDS

    dec = corpus_build_monolithic(docs).localCheckpoint(eager=True)
    surv = dec.filter(F.col("stage").isin("kept", "budget")).select("doc_id")
    clean = substring_cut_tokens_frame(
        docs.select("doc_id", "text").join(surv, "doc_id")
    ).select("doc_id", F.array_join("t_clean", " ").alias("text_clean"))
    train = dec.filter("selected AND split = 'train'").select(
        "doc_id",
        "n_tokens_clean",
        "pack_id",
        (F.col("doc_id") % PACK_SHARDS).cast("bigint").alias("shard"),
    )
    member = F.array_sort(F.collect_list(F.struct("doc_id", "text_clean")))
    return (
        train.join(clean, "doc_id")
        .groupBy("shard", "pack_id")
        .agg(
            member.alias("_m"),
            F.sum("n_tokens_clean").cast("bigint").alias("pack_tokens"),
            F.count("*").cast("bigint").alias("n_docs"),
        )
        .select(
            "shard",
            F.col("pack_id").cast("bigint").alias("pack_id"),
            F.concat_ws(eos, F.expr("transform(_m, x -> x.text_clean)")).alias(
                "packed_text"
            ),
            "pack_tokens",
            "n_docs",
        )
    )


def test_changelog_consumer_maintains_packed_artifact(spark, tmp_path):
    """The certified change-log CONSUMER (r12 verdict item 2): after
    every build batch, extend_materialized_corpus advances the packed
    train artifact by tailing cb_decision_log — and the maintained
    packs are byte-identical to a full re-materialization over the
    accumulated prefix, including batches that EVICT docs from packs
    (budget-line moves and dup displacement).  Re-delivery with no new
    build batch is a committed no-op."""
    from data_ingestion_backend_spark.operators.corpus_incremental import (
        MAT_PACKS,
        extend_materialized_corpus,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    evicted_seen = False
    for i, (lo, hi) in enumerate(BATCH_BOUNDS):
        assert extend_corpus_build(wh, _batch(spark, lo, hi), i) is True
        assert extend_materialized_corpus(wh) is True
        got = _rows(wh.read(MAT_PACKS).drop("ppb"))
        want = _rows(_mono_packs(spark, _docs(spark).filter(F.col("doc_id") < hi)))
        assert got == want, f"packs diverged after batch {i}"
        if i > 0:
            log = wh.read(CB_CHANGELOG).filter(F.col("batch_id") == i)
            if log.filter(
                (F.col("old_stage") == "kept") & (~F.col("selected"))
            ).count() > 0:
                evicted_seen = True
    assert evicted_seen, "fixture run never evicted a doc from a pack"
    # idle / re-delivered: committed no-op
    assert extend_materialized_corpus(wh) is False
    # and against the graded materializer over the full fixture
    from data_ingestion_backend_spark.operators.corpus import (
        CORPUS_PACKS_TABLE,
        materialize_corpus_build,
    )

    wh2 = Warehouse(spark, str(tmp_path / "wh2"))
    materialize_corpus_build(wh2, spark, SF_DIR_SMALL)
    assert _rows(wh.read(MAT_PACKS).drop("ppb")) == _rows(
        wh2.read(CORPUS_PACKS_TABLE)
    )
