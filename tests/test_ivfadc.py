"""IVFADC (coarse cells + residual PQ): numpy end-to-end differential,
persisted ≡ in-memory, physical partition pruning, recall floor,
determinism.  Rows-only in the uniform gate (two nested Lloyd loops);
these goldens are the value cert."""

from __future__ import annotations

import os
import re

import numpy as np
import pytest

from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.similarity import (
    IVF_NPROBE,
    PQ_QUERIES,
    TOPK,
    _emb,
    _lloyd_spherical,
    _sample_matrix,
    build_ivfadc_index,
    ivfadc_search_persisted,
    ivfadc_topk,
    pq_train,
)
from data_ingestion_backend_spark.registry import QUERIES
from tests.conftest import SF_DIR_ORACLE


@pytest.fixture(scope="module")
def emb(spark):
    return _emb(spark, SF_DIR_ORACLE).select("vec_id", "e")


def _queries(emb, n=PQ_QUERIES):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )


def _numpy_ivfadc(emb_rows, C, Cpq, query_ids, nprobe, k):
    """Independent numpy replication of the whole search: normalize →
    assign → residualize → PQ-encode → per-(query, cell) ADC → top-k.
    Distance terms accumulate left-to-right (the engine's pinned
    order); adc rounds to 6 like the Spark terminal.  Subspace count
    and width come from the codebook SHAPE (the engine's own reader
    contract), so the differential follows the m dial."""
    n_sub, _, d_sub = Cpq.shape
    ids = np.asarray([r["vec_id"] for r in emb_rows])
    M = np.asarray([r["e"] for r in emb_rows], dtype=np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    assign = np.argsort(-(M @ C.T), axis=1)[:, 0]
    resid = M - C[assign]

    def codes_of(R):
        out = np.zeros((len(R), n_sub), dtype=np.int64)
        for s in range(n_sub):
            sv = R[:, s * d_sub : (s + 1) * d_sub]
            d2 = ((sv[:, None, :] - Cpq[s][None]) ** 2).sum(-1)
            out[:, s] = d2.argmin(axis=1)
        return out

    codes = codes_of(resid)
    results = []
    for qid in query_ids:
        qi = int(np.where(ids == qid)[0][0])
        q = M[qi]
        probe = np.argsort(-(q @ C.T))[:nprobe]
        cand = []
        for cell in probe:
            qr = q - C[cell]
            # dt table: strict left-to-right accumulation over d_sub
            dt = np.zeros((n_sub, Cpq.shape[1]))
            for d in range(d_sub):
                for s in range(n_sub):
                    dt[s] += (
                        qr[s * d_sub + d] - Cpq[s, :, d]
                    ) ** 2
            members = np.where(assign == cell)[0]
            for m_i in members:
                vid = int(ids[m_i])
                if vid == qid:
                    continue
                acc = 0.0
                for s in range(n_sub):
                    acc += dt[s, codes[m_i, s]]
                cand.append((vid, round(acc, 6)))
        cand.sort(key=lambda t: (t[1], t[0]))
        results.extend((qid, vid, adc) for vid, adc in cand[:k])
    return results


def test_ivfadc_matches_numpy_end_to_end(spark, emb):
    C = _lloyd_spherical(_sample_matrix(emb))
    got = [
        (r["query_id"], r["vec_id"], r["adc"])
        for r in ivfadc_topk(emb, _queries(emb)).collect()
    ]
    # the trained quantizers are the engine's own (deterministic); the
    # SEARCH pipeline is replicated independently in numpy
    from data_ingestion_backend_spark.operators.similarity import (
        _ivfadc_encode,
    )

    _, Cpq = _ivfadc_encode(spark, emb, C)  # noqa: the engine's own quantizers
    want = _numpy_ivfadc(
        emb.collect(), C, Cpq, list(range(PQ_QUERIES)), IVF_NPROBE, TOPK
    )
    assert got == want


def test_ivfadc_persisted_equals_inmemory_and_prunes(spark, emb, tmp_path):
    path = str(tmp_path / "ivfadc")
    build_ivfadc_index(spark, path, emb)
    got = ivfadc_search_persisted(spark, path, _queries(emb), nprobe=IVF_NPROBE)
    want = ivfadc_topk(emb, _queries(emb), nprobe=IVF_NPROBE)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    # physical pruning: the probed scan touches only probed cluster dirs
    crows = (
        spark.read.parquet(os.path.join(path, "centroids"))
        .orderBy("cluster")
        .collect()
    )
    C = np.asarray([r["centroid"] for r in crows])
    from data_ingestion_backend_spark.operators.similarity import (
        _assign_clusters,
        _normalized_queries,
    )

    probes = _assign_clusters(
        _normalized_queries(_queries(emb)), "qe", C, IVF_NPROBE
    )
    probe_ids = {r["cluster"] for r in probes.select("cluster").distinct().collect()}
    touched = (
        spark.read.parquet(os.path.join(path, "codes"))
        .filter(F.col("cluster").isin(sorted(probe_ids)))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    clusters_touched = {
        int(re.search(r"cluster=(\d+)", r["f"]).group(1)) for r in touched
    }
    assert clusters_touched <= probe_ids
    assert len(clusters_touched) < len(crows), "no pruning happened"

    # calibrated default is persisted and usable
    rec = spark.read.parquet(os.path.join(path, "stats")).collect()[0][
        "recommended_nprobe"
    ]
    assert rec >= IVF_NPROBE
    assert ivfadc_search_persisted(spark, path, _queries(emb)).count() > 0


def test_ivfadc_recall_floor_and_residual_beats_raw_pq(spark, emb):
    """Raw residual-ADC recall@10 must clear the floor — and beat raw
    (non-residual) PQ ADC at the same k, the reason IVFADC residualizes."""
    exact = QUERIES["sim_multiquery_topk"](spark, SF_DIR_ORACLE).collect()
    es: dict[int, set] = {}
    for r in exact:
        es.setdefault(r["query_id"], set()).add(r["vec_id"])

    got = ivfadc_topk(emb, _queries(emb), k=10).collect()
    gs: dict[int, set] = {}
    for r in got:
        gs.setdefault(r["query_id"], set()).add(r["vec_id"])
    rec = [len(es[k] & gs.get(k, set())) / len(es[k]) for k in es]
    ivfadc_recall = sum(rec) / len(rec)
    assert ivfadc_recall >= 0.45, rec

    from data_ingestion_backend_spark.operators.similarity import pq_topk

    Craw, _ = pq_train(emb)
    raw = pq_topk(spark, emb, Craw, rerank=False, k=10).collect()
    rs: dict[int, set] = {}
    for r in raw:
        rs.setdefault(r["query_id"], set()).add(r["vec_id"])
    raw_rec = [len(es[k] & rs.get(k, set())) / len(es[k]) for k in es]
    assert ivfadc_recall > sum(raw_rec) / len(raw_rec), (rec, raw_rec)


def test_ivfadc_deterministic(spark, emb):
    a = [tuple(r) for r in ivfadc_topk(emb, _queries(emb)).collect()]
    b = [tuple(r) for r in ivfadc_topk(emb, _queries(emb)).collect()]
    assert a == b
    assert a, "vacuous"


def test_ivfadc_append_frozen_equals_rebuild_encode(spark, emb, tmp_path):
    """Frozen-quantizer append: appended codes must equal encoding the
    batch directly with the index's coarse centroids + residual
    codebooks, and the appended vectors become searchable."""
    from data_ingestion_backend_spark.operators.similarity import (
        _assign_clusters,
        _centroid_df,
        _normalized_emb,
        _pq_assign,
        _read_codebooks,
        _residualize,
        _subvector_table,
        append_to_ivfadc_index,
    )

    base = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "ivfadc_app")
    build_ivfadc_index(spark, path, base)
    report = append_to_ivfadc_index(spark, path, batch, batch_id=1)
    assert report["retrain"] is False, report
    # cross-fit baselines: a same-distribution batch reads ~0 on the
    # coarse monitor and a bounded ratio on the residual one.  The band
    # is calibrated to the m=32 default (finer codebooks shrink absolute
    # recon, so the train/holdout gap is proportionally LARGER): measured
    # healthy 0.166 vs planted-shift 0.580 — still 3.5x separation, with
    # the coarse monitor (0 vs 0.9) the primary signal either way.
    assert abs(report["drift"]) < 0.05, report
    assert abs(report["recon_drift"]) < 0.3, report

    crows = (
        spark.read.parquet(os.path.join(path, "centroids"))
        .orderBy("cluster")
        .collect()
    )
    C = np.asarray([r["centroid"] for r in crows], dtype=np.float64)
    Cpq = _read_codebooks(spark, path)
    resid = _residualize(
        _assign_clusters(_normalized_emb(batch), "e", C, 1),
        _centroid_df(spark, C),
        "e",
    )
    want = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in _pq_assign(
            spark,
            # split at the index's OWN subspace count (recovered from the
            # persisted codebook shape, like the append path does) — the
            # bare default is the flat-PQ m, not the IVFADC m
            _subvector_table(resid.select("vec_id", "e"), m=len(Cpq)),
            Cpq,
        ).collect()
    }
    got = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in spark.read.parquet(os.path.join(path, "codes"))
        .filter(F.col("vec_id") >= 400)
        .collect()
    }
    assert got == want

    # appended vectors are searchable and the batch partition is owned:
    # a re-delivered batch_id changes nothing
    once = [
        tuple(r)
        for r in ivfadc_search_persisted(spark, path, _queries(emb)).collect()
    ]
    n_once = spark.read.parquet(os.path.join(path, "codes")).count()
    append_to_ivfadc_index(spark, path, batch, batch_id=1)  # re-delivery
    assert spark.read.parquet(os.path.join(path, "codes")).count() == n_once
    again = [
        tuple(r)
        for r in ivfadc_search_persisted(spark, path, _queries(emb)).collect()
    ]
    assert again == once


def test_ivfadc_drift_fires_on_shifted_batch(spark, emb, tmp_path):
    from data_ingestion_backend_spark.operators.similarity import (
        append_to_ivfadc_index,
    )

    path = str(tmp_path / "ivfadc_drift")
    build_ivfadc_index(spark, path, emb.filter(F.col("vec_id") < 400))
    shifted = emb.filter(F.col("vec_id") >= 400).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("e", lambda x: x * 10.0 + 5.0).alias("e"),
    )
    report = append_to_ivfadc_index(spark, path, shifted)
    assert report["drift"] > 0.05, report  # coarse monitor fires
    assert report["retrain"] is True
    # the residual tier degrades too, just less sharply (documented)
    assert report["recon_drift"] > 0.1, report


def test_ivfadc_rerank_lifts_recall_over_raw_adc(spark, emb, tmp_path):
    """IVFADC+R: exact re-rank of the ADC shortlist against the raw
    corpus must not lose recall vs the raw ADC top-k, and its output is
    exact-cosine-ordered (the production refinement the recallbench
    measures at 10x/25x)."""
    from data_ingestion_backend_spark.operators.similarity import (
        ivfadc_search_persisted,
    )

    path = str(tmp_path / "ivfadc_rr")
    build_ivfadc_index(spark, path, emb)
    exact = QUERIES["sim_multiquery_topk"](spark, SF_DIR_ORACLE).collect()
    es: dict[int, set] = {}
    for r in exact:
        es.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(rows):
        by_q: dict[int, set] = {}
        for r in rows:
            by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(
            len(es[q] & by_q.get(q, set())) / len(es[q]) for q in es
        ) / len(es)

    raw = ivfadc_search_persisted(spark, path, _queries(emb), k=10).collect()
    rr = ivfadc_search_persisted(
        spark, path, _queries(emb), k=10, rerank_corpus=emb
    ).collect()
    assert recall(rr) >= recall(raw), (recall(raw), recall(rr))
    assert rr[0].__fields__ == ["query_id", "vec_id", "cosine"]
    # within each query the cosines are non-increasing (exact re-rank)
    by_q: dict[int, list] = {}
    for r in rr:
        by_q.setdefault(r["query_id"], []).append(r["cosine"])
    for cs in by_q.values():
        assert cs == sorted(cs, reverse=True)


def test_ivfadc_subspace_count_is_a_parameter(spark, emb, tmp_path):
    """build_ivfadc_index(m=...) trains that many residual subspaces;
    readers recover m from the codebook shape, so persisted search and
    append work with no extra state."""
    from data_ingestion_backend_spark.operators.similarity import (
        _read_codebooks,
        append_to_ivfadc_index,
        ivfadc_search_persisted,
    )

    path = str(tmp_path / "ivfadc_m16")
    build_ivfadc_index(spark, path, emb.filter(F.col("vec_id") < 400), m=16)
    C = _read_codebooks(spark, path)
    assert C.shape[0] == 16 and C.shape[2] == 64 // 16
    codes = spark.read.parquet(os.path.join(path, "codes"))
    assert codes.select("sub").distinct().count() == 16
    got = ivfadc_search_persisted(spark, path, _queries(emb))
    assert got.count() > 0
    # frozen-quantizer append encodes with the index's own m
    batch = emb.filter(F.col("vec_id") >= 400).select(
        (F.col("vec_id") + 9000).alias("vec_id"), "e"
    )
    append_to_ivfadc_index(spark, path, batch, batch_id=1)
    appended = spark.read.parquet(os.path.join(path, "codes")).filter(
        F.col("vec_id") >= 9000
    )
    assert appended.select("sub").distinct().count() == 16


def test_search_only_bench_entries_reuse_memoized_index(spark, emb):
    """The r11 bench split: sim_{pq,ivfadc}_search time SEARCH over a
    per-process memoized persisted index (the bench warm-up pays the
    build).  The entries return real rows, match a direct persisted
    search over the same index, and the second call reuses the index
    instead of retraining."""
    from data_ingestion_backend_spark.operators.queries import (
        STANDALONE_QUERIES,
    )
    from data_ingestion_backend_spark.operators.similarity import (
        _BENCH_INDEX_MEMO,
    )

    first = STANDALONE_QUERIES["sim_ivfadc_search"](spark, SF_DIR_ORACLE)
    rows1 = [tuple(r) for r in first.collect()]
    assert rows1
    memo_after_1 = dict(_BENCH_INDEX_MEMO)
    idx_path = memo_after_1[(os.path.abspath(SF_DIR_ORACLE), "ivfadc")]
    want = [
        tuple(r)
        for r in ivfadc_search_persisted(spark, idx_path, _queries(emb)).collect()
    ]
    assert rows1 == want
    rows2 = [
        tuple(r)
        for r in STANDALONE_QUERIES["sim_ivfadc_search"](spark, SF_DIR_ORACLE).collect()
    ]
    assert rows2 == rows1
    assert _BENCH_INDEX_MEMO == memo_after_1  # no rebuild

    pq_rows = STANDALONE_QUERIES["sim_pq_search"](spark, SF_DIR_ORACLE).collect()
    assert len(pq_rows) > 0
    assert pq_rows[0].__fields__ == ["query_id", "vec_id", "adc"]
