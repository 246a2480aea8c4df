"""The two Jaccard-verify paths (array vs exploded) must agree exactly,
and the size guard must route book-length corpora to the exploded form."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR_ORACLE
from data_ingestion_backend_spark.operators.dedup import (
    _band_table,
    _verify_jaccard,
    _verify_jaccard_exploded,
    minhash_per_doc_frame,
)
from data_ingestion_backend_spark.sources.fixtures import load_table


def _pairs(per_doc):
    b = _band_table(per_doc)
    x, y = b.alias("x"), b.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def test_exploded_verify_equals_array_verify(spark):
    docs = load_table(spark, SF_DIR_ORACLE, "documents").select("doc_id", "text")
    per_doc = minhash_per_doc_frame(docs).localCheckpoint(eager=True)
    cand = _pairs(per_doc).localCheckpoint(eager=True)
    assert cand.count() > 0, "no LSH candidates — test is vacuous"

    as_set = lambda df: {tuple(r) for r in df.collect()}
    arr = as_set(_verify_jaccard(per_doc, cand, threshold=0.8))
    exp = as_set(_verify_jaccard_exploded(per_doc, cand, threshold=0.8))
    assert arr == exp
    assert arr, "no verified pairs — threshold too high for fixture"
    # unthresholded too (covers the zero-intersection fill path)
    assert as_set(_verify_jaccard(per_doc, cand, None)) == as_set(
        _verify_jaccard_exploded(per_doc, cand, None)
    )


def test_size_guard_routes_to_exploded(spark, monkeypatch):
    import data_ingestion_backend_spark.operators.dedup as dd

    docs = load_table(spark, SF_DIR_ORACLE, "documents").select("doc_id", "text")
    per_doc = minhash_per_doc_frame(docs).localCheckpoint(eager=True)
    cand = _pairs(per_doc).localCheckpoint(eager=True)

    called = []
    real = dd._verify_jaccard_exploded

    def spy(per_doc_, pairs_, thr):
        called.append(1)
        return real(per_doc_, pairs_, thr)

    monkeypatch.setattr(dd, "_verify_jaccard_exploded", spy)
    monkeypatch.setattr(dd, "VERIFY_EXPLODE_OVER", 1)  # every doc is "huge"
    out = dd._verify_jaccard(per_doc, cand, threshold=0.8)
    assert out.count() >= 0 and called, "guard did not route to exploded path"


def test_explicit_max_n_skips_probe_and_routes(spark, monkeypatch):
    """Callers holding persisted index stats pass max_n: no probe job
    runs, and the value routes the path exactly like the probed one."""
    import data_ingestion_backend_spark.operators.dedup as dd

    docs = load_table(spark, SF_DIR_ORACLE, "documents").select("doc_id", "text")
    per_doc = minhash_per_doc_frame(docs).localCheckpoint(eager=True)
    cand = _pairs(per_doc).localCheckpoint(eager=True)

    def boom(_):
        raise AssertionError("probe ran despite explicit max_n")

    monkeypatch.setattr(dd, "_max_shingle_count", boom)
    arr = dd._verify_jaccard(per_doc, cand, 0.8, max_n=1)  # tiny → array path
    exploded = []
    real = dd._verify_jaccard_exploded
    monkeypatch.setattr(
        dd,
        "_verify_jaccard_exploded",
        lambda *a: (exploded.append(1), real(*a))[1],
    )
    huge = dd._verify_jaccard(per_doc, cand, 0.8, max_n=dd.VERIFY_EXPLODE_OVER + 1)
    as_set = lambda df: {tuple(r) for r in df.collect()}
    assert exploded, "max_n over threshold did not route to exploded path"
    assert as_set(arr) == as_set(huge)


def test_probe_memo_is_bounded(spark):
    """Fresh per-doc handles (the streaming pattern) must not grow the
    memo without bound — each dead entry pins its DataFrame forever."""
    import data_ingestion_backend_spark.operators.dedup as dd

    docs = load_table(spark, SF_DIR_ORACLE, "documents").select("doc_id", "text")
    small = docs.limit(5)
    for _ in range(dd._VERIFY_PROBE_MEMO_CAP + 3):
        dd._max_shingle_count(minhash_per_doc_frame(small))
    assert len(dd._VERIFY_PROBE_MEMO) <= dd._VERIFY_PROBE_MEMO_CAP
