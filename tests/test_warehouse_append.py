"""File-level append (`Warehouse.stage_append`): the next version must
read as base ∪ delta while MOVING only the delta's bytes — base files
are hard-linked (same inode), never rewritten.  This is the property
that keeps maintained-table batches O(batch): the union-rewrite form
pays O(corpus) bytes per batch by construction (SCALE.md §5)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_ingestion_backend_spark.sources.warehouse import Warehouse


def _jobs(spark, lo, hi, status="PENDING"):
    return spark.range(lo, hi).selectExpr(
        "cast(id as string) job_id", "id job_user_id", "'f' job_filename",
        f"'{status}' job_status", "0L job_total_rows", "0L job_processed_rows",
        "0L job_issue_count", "cast(null as string) job_error",
        "timestamp'2026-01-01' job_created_at", "timestamp'2026-01-01' job_updated_at",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _data_files(path):
    out = []
    for dirpath, _dirs, files in os.walk(path):
        out += [
            os.path.join(dirpath, f)
            for f in files
            if not f.startswith(("_", "."))
        ]
    return sorted(out)


def test_append_reads_as_base_union_delta(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    base = _jobs(spark, 0, 100)
    delta = _jobs(spark, 100, 130, "DONE")
    v0 = wh.write("jobs", base)
    v1 = wh.stage_append("jobs", delta, base_version=v0)
    wh.publish({"jobs": v1})
    assert _rows(wh.read("jobs")) == _rows(base.unionByName(delta))
    # time travel to the base still works — versions stay immutable
    assert _rows(wh.read("jobs", v0)) == _rows(base)


def test_append_links_base_files_instead_of_rewriting(spark, tmp_path):
    """The scale contract itself: every base data file appears in the new
    version as the SAME inode (a name, not a copy), and the only files
    with fresh inodes are the delta's."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    v0 = wh.write("jobs", _jobs(spark, 0, 100))
    v1 = wh.stage_append("jobs", _jobs(spark, 100, 110), base_version=v0)
    base_inodes = {os.stat(p).st_ino for p in _data_files(wh._version_path("jobs", v0))}
    new_files = _data_files(wh._version_path("jobs", v1))
    new_inodes = {os.stat(p).st_ino for p in new_files}
    assert base_inodes <= new_inodes  # every base file re-linked
    fresh = new_inodes - base_inodes
    assert fresh  # the delta's own files
    # all base bytes arrived by link: each base file now has ≥2 names
    for p in _data_files(wh._version_path("jobs", v0)):
        assert os.stat(p).st_nlink >= 2


def test_chained_appends_accumulate(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write("jobs", _jobs(spark, 0, 10))
    for i in range(1, 4):
        v = wh.stage_append("jobs", _jobs(spark, 10 * i, 10 * (i + 1)))
        wh.publish({"jobs": v})
    assert wh.read("jobs").count() == 40
    assert _rows(wh.read("jobs")) == _rows(_jobs(spark, 0, 40))


def test_vacuumed_base_does_not_corrupt_newer_versions(spark, tmp_path):
    """vacuum() removes old version DIRECTORIES; hard links mean that
    only unlinks names — the inodes live until the newest version that
    references them is itself vacuumed."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write("jobs", _jobs(spark, 0, 50))
    for i in range(1, 5):
        v = wh.stage_append("jobs", _jobs(spark, 50 + 10 * (i - 1), 50 + 10 * i))
        wh.publish({"jobs": v})
    wh.vacuum("jobs", keep=1)
    assert not os.path.isdir(wh._version_path("jobs", 0))
    assert _rows(wh.read("jobs")) == _rows(_jobs(spark, 0, 90))


def test_crashed_append_orphan_is_overwritten(spark, tmp_path):
    """A crash after stage_append but before publish leaves an orphan
    v=N+1 holding links + delta files; the healed retry must overwrite
    it cleanly (links are names — clearing them never touches v=N)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    v0 = wh.write("jobs", _jobs(spark, 0, 20))
    wh.stage_append("jobs", _jobs(spark, 20, 25), base_version=v0)  # no publish
    assert wh.current_version("jobs") == v0
    # retry with DIFFERENT delta content (the redelivered batch)
    v1 = wh.stage_append("jobs", _jobs(spark, 20, 30), base_version=v0)
    wh.publish({"jobs": v1})
    assert _rows(wh.read("jobs")) == _rows(_jobs(spark, 0, 30))
    assert _rows(wh.read("jobs", v0)) == _rows(_jobs(spark, 0, 20))


def test_compact_bounds_file_count_preserving_data(spark, tmp_path):
    """After B appends a version holds O(B) file sets; compact() rewrites
    to the normal per-table sizing in one atomic commit, data unchanged,
    and subsequent appends resume from the compacted base."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write("jobs", _jobs(spark, 0, 10))
    for i in range(1, 6):
        wh.publish({"jobs": wh.stage_append("jobs", _jobs(spark, 10 * i, 10 * (i + 1)))})
    pre = len(_data_files(wh._version_path("jobs", wh.current_version("jobs"))))
    v = wh.compact("jobs")
    post = len(_data_files(wh._version_path("jobs", v)))
    assert post < pre
    assert _rows(wh.read("jobs")) == _rows(_jobs(spark, 0, 60))
    # append-after-compact continues the O(batch) path
    wh.publish({"jobs": wh.stage_append("jobs", _jobs(spark, 60, 70))})
    assert wh.read("jobs").count() == 70


def _pjobs(spark, lo, hi, status="PENDING"):
    return _jobs(spark, lo, hi, status).withColumn(
        "pb", F.expr("job_user_id div 10")
    )


def test_partition_delta_rewrites_only_affected_partitions(spark, tmp_path):
    """The Delta-MERGE shape: a mutation touching two doc buckets links
    every other bucket's base files (same inode) and writes fresh files
    only for the affected buckets — read ≡ full-rewrite result."""
    from pyspark.sql import functions as F_

    wh = Warehouse(spark, str(tmp_path / "wh"))
    base = _pjobs(spark, 0, 100)  # pb ∈ 0..9
    v0 = wh.stage("jobs", base, ["pb"])
    wh.publish({"jobs": v0})
    # mutate buckets 2 and 7: drop ids 25-29, rewrite 70-79 as DONE
    repl = (
        base.filter(F_.col("pb").isin(2, 7))
        .filter(~F_.col("job_user_id").between(25, 29))
        .withColumn(
            "job_status",
            F_.when(F_.col("pb") == 7, F_.lit("DONE")).otherwise(
                F_.col("job_status")
            ),
        )
    )
    v1 = wh.stage_partition_delta("jobs", repl, [2, 7], v0, "pb")
    wh.publish({"jobs": v1})
    want = base.filter(~F_.col("job_user_id").between(25, 29)).withColumn(
        "job_status",
        F_.when(F_.col("pb") == 7, F_.lit("DONE")).otherwise(F_.col("job_status")),
    )
    assert _rows(wh.read("jobs")) == _rows(want)
    # unaffected buckets arrived by LINK (same inode), affected are fresh
    import os as os_

    for pb in (0, 1, 3, 9):
        bdir = os_.path.join(wh._version_path("jobs", v0), f"pb={pb}")
        ndir = os_.path.join(wh._version_path("jobs", v1), f"pb={pb}")
        assert {
            os_.stat(os_.path.join(bdir, f)).st_ino
            for f in os_.listdir(bdir)
            if not f.startswith(("_", "."))  # CRC sidecars are not linked
        } <= {
            os_.stat(os_.path.join(ndir, f)).st_ino
            for f in os_.listdir(ndir)
            if not f.startswith(("_", "."))
        }
    base_inodes = set()
    for f in os_.listdir(os_.path.join(wh._version_path("jobs", v0), "pb=2")):
        if not f.startswith(("_", ".")):
            base_inodes.add(os_.stat(os_.path.join(wh._version_path("jobs", v0), "pb=2", f)).st_ino)
    new_inodes = set()
    for f in os_.listdir(os_.path.join(wh._version_path("jobs", v1), "pb=2")):
        if not f.startswith(("_", ".")):
            new_inodes.add(os_.stat(os_.path.join(wh._version_path("jobs", v1), "pb=2", f)).st_ino)
    assert base_inodes.isdisjoint(new_inodes)


def test_partition_delta_drops_fully_deleted_partition(spark, tmp_path):
    """A partition whose replacement is EMPTY must disappear — linking
    its stale base dir would resurrect deleted rows."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    base = _pjobs(spark, 0, 30)  # pb ∈ 0..2
    wh.publish({"jobs": wh.stage("jobs", base, ["pb"])})
    repl = base.limit(0)  # bucket 1 fully deleted
    v1 = wh.stage_partition_delta("jobs", repl, [1], 0, "pb")
    wh.publish({"jobs": v1})
    got = wh.read("jobs")
    assert got.count() == 20
    assert got.filter("pb = 1").count() == 0


def test_empty_base_falls_back_to_plain_stage(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    v = wh.stage_append("jobs", _jobs(spark, 0, 5))
    wh.publish({"jobs": v})
    assert wh.read("jobs").count() == 5


def test_append_layout_mismatch_raises(spark, tmp_path):
    """stage_append must refuse to mix directory layouts in one version
    (flat base + partitioned delta or vice versa): Spark rejects the mix
    only at READ time ('conflicting directory structures'), i.e. after
    the corrupt snapshot is already committed — the guard moves that to
    write time."""
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    v0 = wh.write("jobs", _jobs(spark, 0, 20))  # flat base
    with pytest.raises(ValueError, match="flat"):
        wh.stage_append("jobs", _pjobs(spark, 20, 30), v0, partition_by=["pb"])

    wh2 = Warehouse(spark, str(tmp_path / "wh2"))
    p0 = wh2.write("jobs", _pjobs(spark, 0, 20), ["pb"])  # partitioned base
    with pytest.raises(ValueError, match="hive-partitioned"):
        wh2.stage_append("jobs", _pjobs(spark, 20, 30), p0)


def test_append_onto_partitioned_base_with_matching_layout(spark, tmp_path):
    """The partitioned append path itself: a delta written with the
    base's own partition_by links every base partition dir and reads as
    base ∪ delta."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    base = _pjobs(spark, 0, 20)
    delta = _pjobs(spark, 20, 30, "DONE")
    v0 = wh.write("jobs", base, ["pb"])
    v1 = wh.stage_append("jobs", delta, v0, partition_by=["pb"])
    wh.publish({"jobs": v1})
    got = wh.read("jobs")
    assert got.count() == 30
    assert got.filter("job_status = 'DONE'").count() == 10
    # base partition dirs arrived by link (same inode)
    bdir = os.path.join(wh._version_path("jobs", v0), "pb=0")
    ndir = os.path.join(wh._version_path("jobs", v1), "pb=0")
    base_inodes = {
        os.stat(os.path.join(bdir, f)).st_ino
        for f in os.listdir(bdir)
        if not f.startswith(("_", "."))
    }
    new_inodes = {
        os.stat(os.path.join(ndir, f)).st_ino
        for f in os.listdir(ndir)
        if not f.startswith(("_", "."))
    }
    assert base_inodes <= new_inodes


def test_partition_delta_legacy_flat_base_migrates_not_drops(spark, tmp_path):
    """A base staged by pre-delta union-rewrite code is FLAT: the link
    loop only copies 'pb=...' dirs, so linking around it would silently
    drop every unaffected base row.  The guard instead migrates (full
    partitioned stage of the caller's merged frame) or raises — never
    loses data."""
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    legacy = _pjobs(spark, 0, 30)  # pb present as a COLUMN, layout flat
    v0 = wh.write("jobs", legacy)
    repl = _pjobs(spark, 5, 10, "DONE")  # replacement rows for pb=0
    with pytest.raises(ValueError, match="legacy flat"):
        wh.stage_partition_delta("jobs", repl, [0], v0, "pb")
    merged = legacy.filter("pb != 0").unionByName(
        _pjobs(spark, 0, 10, "DONE").filter("pb = 0")
    )
    v1 = wh.stage_partition_delta("jobs", repl, [0], v0, "pb", full_df=merged)
    wh.publish({"jobs": v1})
    assert _rows(wh.read("jobs").select("job_user_id", "job_status")) == _rows(
        merged.select("job_user_id", "job_status")
    )
    # migrated: the version is now hive-partitioned, so the NEXT batch
    # takes the bounded delta path
    assert os.path.isdir(os.path.join(wh._version_path("jobs", v1), "pb=1"))
    repl2 = _pjobs(spark, 20, 25, "FAILED")
    v2 = wh.stage_partition_delta("jobs", repl2, [2], v1, "pb")
    wh.publish({"jobs": v2})
    assert wh.read("jobs").filter("job_status = 'FAILED'").count() == 5


def test_compact_trigger_fires_on_file_count_and_preserves_state(spark, tmp_path):
    """compact_if_needed: a cheap no-op below the threshold, a full
    atomic rewrite above it — rows identical, reader file count back to
    the normal snapshot sizing, appends resume on the compacted base."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    v = wh.write("jobs", _jobs(spark, 0, 20))
    for i in range(6):  # six file-level appends: one file set each
        v = wh.stage_append("jobs", _jobs(spark, 20 + 10 * i, 30 + 10 * i), v)
        wh.publish({"jobs": v})
    n_files = wh.data_file_count("jobs")
    assert n_files > 8
    assert wh.compact_if_needed("jobs", max_files=n_files) is None  # below
    before = _rows(wh.read("jobs"))
    assert wh.compact_if_needed("jobs", max_files=8) is not None
    assert _rows(wh.read("jobs")) == before
    assert wh.data_file_count("jobs") <= 8
    # appends resume after compaction
    v2 = wh.stage_append("jobs", _jobs(spark, 200, 210), wh.current_version("jobs"))
    wh.publish({"jobs": v2})
    assert wh.read("jobs").count() == 90


def test_compact_transform_folds_log_structured_state(spark, tmp_path):
    """The transform hook: a delta-log table (here, (g, df) partial
    counts) folds to one row per key on compaction; the aggregate state
    is invariant."""
    from pyspark.sql import functions as F_

    wh = Warehouse(spark, str(tmp_path / "wh"))
    v = -1
    for b in range(5):
        delta = spark.createDataFrame(
            [(g, 1) for g in range(b, b + 10)], "g long, df long"
        )
        v = wh.stage_append("cb_gram_df", delta, v if v >= 0 else None)
        wh.publish({"cb_gram_df": v})
    state_before = _rows(
        wh.read("cb_gram_df").groupBy("g").agg(F_.sum("df").alias("df"))
    )
    fold = lambda df: df.groupBy("g").agg(
        F_.sum("df").cast("bigint").alias("df")
    ).filter(F_.col("df") != 0)
    assert wh.compact_if_needed("cb_gram_df", max_files=1, transform=fold)
    got = _rows(wh.read("cb_gram_df").groupBy("g").agg(F_.sum("df").alias("df")))
    assert got == state_before
    # folded: exactly one row per key now
    assert wh.read("cb_gram_df").count() == len(state_before)


def test_compact_trigger_is_per_leaf_not_total(spark, tmp_path):
    """A hive-partitioned table can never hold fewer total files than
    partition values, so the trigger compares the worst LEAF directory:
    many one-file partitions must NOT fire (a total-count trigger would
    thrash a full rewrite every batch — the r12 grown-soak lesson),
    while a hot partition accumulating appends must."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    base = _pjobs(spark, 0, 100)  # 10 partitions, ~1 file each
    v = wh.write("jobs", base, ["pb"])
    assert wh.data_file_count("jobs") >= 10
    assert wh.max_files_per_leaf("jobs") <= 3
    # total exceeds 8, worst leaf does not: no compaction
    assert wh.compact_if_needed("jobs", ["pb"], max_files=8) is None
    # grow ONE hot partition past the leaf threshold via appends
    for i in range(9):
        v = wh.stage_append(
            "jobs", _pjobs(spark, 5, 8), v, partition_by=["pb"]
        )
        wh.publish({"jobs": v})
    assert wh.max_files_per_leaf("jobs") > 8
    before = wh.read("jobs").count()
    assert wh.compact_if_needed("jobs", ["pb"], max_files=8) is not None
    assert wh.max_files_per_leaf("jobs") <= 3
    assert wh.read("jobs").count() == before


def test_compact_smallfiles_links_settled_files_unread(spark, tmp_path):
    """Size-tiered merge for grow-only flat tables: files at or above
    the settled size must arrive in the compacted version as the SAME
    inode (linked, never read or rewritten), while the small-file tail
    merges — the economics that keep compacting a raw-text corpus table
    from re-paying O(corpus-text) every trigger interval."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    v = wh.write("jobs", _jobs(spark, 0, 400))
    for i in range(6):
        v = wh.stage_append("jobs", _jobs(spark, 400 + i, 401 + i), v)
        wh.publish({"jobs": v})
    base_path = wh._version_path("jobs", v)
    sizes = sorted(os.path.getsize(p) for p in _data_files(base_path))
    # settle threshold between the tiny 1-row deltas and the big base
    # files: the base files are exempt, the delta tail merges
    settled = sizes[-1]  # only the largest file(s) are settled
    settled_files = [
        p for p in _data_files(base_path) if os.path.getsize(p) >= settled
    ]
    assert settled_files and len(settled_files) < len(_data_files(base_path))
    before = _rows(wh.read("jobs"))
    unsettled_n = len(_data_files(base_path)) - len(settled_files)
    # below threshold: no-op
    assert (
        wh.compact_smallfiles("jobs", max_files=unsettled_n, settled_bytes=settled)
        is None
    )
    v2 = wh.compact_smallfiles(
        "jobs", max_files=unsettled_n - 1, settled_bytes=settled
    )
    assert v2 is not None
    assert _rows(wh.read("jobs")) == before  # equal state
    new_files = _data_files(wh._version_path("jobs", v2))
    new_inodes = {os.stat(p).st_ino for p in new_files}
    for p in settled_files:  # every settled file re-linked, unread
        assert os.stat(p).st_ino in new_inodes
        assert os.stat(p).st_nlink >= 2
    # the unsettled tail merged down
    fresh = [p for p in new_files
             if os.stat(p).st_ino not in {os.stat(q).st_ino for q in settled_files}]
    assert len(fresh) < unsettled_n
    # appends resume on the compacted base
    v3 = wh.stage_append("jobs", _jobs(spark, 500, 510), v2)
    wh.publish({"jobs": v3})
    assert wh.read("jobs").count() == 416


def test_compact_smallfiles_refuses_partitioned_layout(spark, tmp_path):
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.write("jobs", _pjobs(spark, 0, 50), ["pb"])
    with pytest.raises(ValueError, match="flat grow-only"):
        wh.compact_smallfiles("jobs", max_files=0)


def test_compact_hot_leaves_rewrites_only_hot(spark, tmp_path):
    """Per-partition compaction: a fired compaction re-files ONLY the
    leaves over threshold; every cold leaf's data files arrive by hard
    link (same inode) — cost proportional to the hot leaves, never the
    table."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    base = _pjobs(spark, 0, 100)  # pb ∈ 0..9, ~1 file each
    v = wh.write("jobs", base, ["pb"])
    # fragment ONE leaf (pb=0) with many appends
    for i in range(9):
        v = wh.stage_append("jobs", _pjobs(spark, 0, 3), v, partition_by=["pb"])
        wh.publish({"jobs": v})
    base_path = wh._version_path("jobs", v)
    cold = [
        p for p in _data_files(base_path) if f"{os.sep}pb=0{os.sep}" not in p
    ]
    assert cold
    before = _rows(wh.read("jobs"))
    # cold leaves alone are under threshold: no-op at a high bar
    assert wh.compact_hot_leaves("jobs", "pb", max_files=64) is None
    v2 = wh.compact_hot_leaves("jobs", "pb", max_files=8)
    assert v2 is not None
    assert _rows(wh.read("jobs")) == before  # equal state (incl. dupes)
    new_path = wh._version_path("jobs", v2)
    new_inodes = {os.stat(p).st_ino for p in _data_files(new_path)}
    for p in cold:  # every cold-leaf file re-linked, unread
        assert os.stat(p).st_ino in new_inodes
        assert os.stat(p).st_nlink >= 2
    # the hot leaf collapsed to the normal per-directory sizing
    hot_files = [
        p
        for p in _data_files(new_path)
        if f"{os.sep}pb=0{os.sep}" in p
    ]
    assert 1 <= len(hot_files) <= 3


def test_base_layout_detects_sibling_branch_corruption(spark, tmp_path):
    """_base_layout must classify from EVERY branch: a version whose
    corruption lives in a sibling partition directory (a data file
    dropped beside deeper nesting, or sibling dirs keyed on different
    columns) is 'mixed' even when the first branch looks clean — so
    stage_append / stage_partition_delta refuse it instead of silently
    linking around it."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    v = wh.write("jobs", _pjobs(spark, 0, 50), ["pb"])
    base = wh._version_path("jobs", v)
    assert wh._base_layout(base) == ("partitioned", ["pb"])
    # corruption in a SIBLING branch: a stray data file inside pb=4,
    # beside its parquet leaves is fine (that IS the leaf level) — so
    # instead nest a bogus deeper dir under pb=4 while pb=0 stays clean
    bogus = os.path.join(base, "pb=4", "x=1")
    os.makedirs(bogus)
    with open(os.path.join(bogus, "part-bogus.parquet"), "wb") as f:
        f.write(b"junk")
    kind, _cols = wh._base_layout(base)
    assert kind == "mixed"
    import shutil as _sh

    _sh.rmtree(bogus)
    # sibling dirs keyed on DIFFERENT columns at one level
    other = os.path.join(base, "zz=9")
    os.makedirs(other)
    with open(os.path.join(other, "part-bogus.parquet"), "wb") as f:
        f.write(b"junk")
    kind, _cols = wh._base_layout(base)
    assert kind == "mixed"
