"""Differential + recall goldens for product quantization (sim_pq_topk).

The registry entry is rows-only (PQ training is iterative Lloyd and ADC
answers are approximate); this file carries the actual contracts:
- codebooks/counts match an independent pure-numpy PQ with the identical
  determinism pins (first-k init, lowest-cid tie-break, PQ_ROUND grid,
  sequential-fold distance order);
- corpus codes from the trained codebooks match exactly;
- ADC distances equal the numpy table-sum arithmetic on the round(6) grid;
- ADC top-10 recall vs exact L2 brute force clears the floor measured at
  fixture scale.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_ingestion_backend_spark.operators.similarity import (
    PQ_DSUB,
    PQ_ITERS,
    PQ_K,
    PQ_QUERIES,
    PQ_ROUND,
    PQ_SUBSPACES,
    _emb,
    pq_encode,
    pq_topk,
    pq_train,
)
from tests.conftest import SF_DIR_SMALL

#: measured on the fixture (near-orthogonal corpus, 4-bit codes): raw
#: ADC@10 recall reads 0.1-0.3 (quantization noise ≈ the distance spread
#: itself — the reason the production shape re-ranks), while the
#: 50-candidate shortlist + exact re-rank reads 0.5/0.8/0.8 across the
#: three probes.  The floor certifies the compressed search stays far
#: above chance (10/499 ≈ 0.02) without overfitting the measurement.
PQ_RECALL_FLOOR = 0.40


def _seq_d2(X: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Squared L2 with the same left-fold order as the Catalyst plan."""
    acc = np.zeros(len(X))
    for j in range(X.shape[1]):
        acc = acc + (X[:, j] - c[j]) ** 2
    return acc


def _numpy_pq(M: np.ndarray, m: int, k: int, iters: int):
    dsub = M.shape[1] // m
    C = np.round(
        np.stack([M[:k, s * dsub : (s + 1) * dsub] for s in range(m)]), PQ_ROUND
    )
    counts = np.zeros((m, k), dtype=np.int64)
    for _ in range(iters):
        newC = C.copy()
        counts = np.zeros((m, k), dtype=np.int64)
        for s in range(m):
            X = M[:, s * dsub : (s + 1) * dsub]
            d2 = np.stack([_seq_d2(X, C[s, c]) for c in range(k)], axis=1)
            a = d2.argmin(axis=1)  # ties -> lowest cid, like min(struct)
            counts[s] = np.bincount(a, minlength=k)
            for c in range(k):
                if counts[s, c]:
                    newC[s, c] = X[a == c].sum(axis=0) / counts[s, c]
        C = np.round(newC, PQ_ROUND)
    return C, counts


def _numpy_codes(M: np.ndarray, C: np.ndarray) -> np.ndarray:
    m, k, dsub = C.shape
    codes = np.zeros((len(M), m), dtype=np.int64)
    for s in range(m):
        X = M[:, s * dsub : (s + 1) * dsub]
        d2 = np.stack([_seq_d2(X, C[s, c]) for c in range(k)], axis=1)
        codes[:, s] = d2.argmin(axis=1)
    return codes


@pytest.fixture(scope="module")
def fixture_matrix(spark):
    rows = _emb(spark, SF_DIR_SMALL).orderBy("vec_id").select("e").toPandas()
    return np.asarray(rows["e"].tolist(), dtype=np.float64)


@pytest.fixture(scope="module")
def trained(spark):
    return pq_train(_emb(spark, SF_DIR_SMALL))


def test_codebooks_match_numpy(spark, fixture_matrix, trained):
    C_spark, n_spark = trained
    C_np, n_np = _numpy_pq(fixture_matrix, PQ_SUBSPACES, PQ_K, PQ_ITERS)
    assert np.array_equal(n_spark, n_np)
    assert np.allclose(C_spark, C_np, atol=10 ** -(PQ_ROUND - 1))
    assert C_spark.shape == (PQ_SUBSPACES, PQ_K, PQ_DSUB)


def test_codes_match_numpy_exactly(spark, fixture_matrix, trained):
    C, _ = trained
    got = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in pq_encode(spark, _emb(spark, SF_DIR_SMALL), C).collect()
    }
    want = _numpy_codes(fixture_matrix, C)
    assert len(got) == len(fixture_matrix) * PQ_SUBSPACES
    for (vid, s), code in got.items():
        assert code == want[vid, s]
        assert 0 <= code < PQ_K


def test_adc_arithmetic_matches_table_sum(spark, fixture_matrix, trained):
    """Raw-ADC surface: every reported distance equals the numpy
    per-subspace table summed along the vector's codes."""
    C, _ = trained
    out = pq_topk(spark, _emb(spark, SF_DIR_SMALL), C, rerank=False).collect()
    codes = _numpy_codes(fixture_matrix, C)
    for q in range(PQ_QUERIES):
        qv = fixture_matrix[q]
        dt = np.zeros((PQ_SUBSPACES, PQ_K))
        for s in range(PQ_SUBSPACES):
            qs = qv[s * PQ_DSUB : (s + 1) * PQ_DSUB]
            for c in range(PQ_K):
                acc = 0.0
                for x, y in zip(qs, C[s, c]):
                    acc += (x - y) * (x - y)
                dt[s, c] = acc
        adc = dt[np.arange(PQ_SUBSPACES), codes].sum(axis=1)
        got_q = [(r["vec_id"], r["adc"]) for r in out if r["query_id"] == q]
        assert len(got_q) > 0
        for vid, a in got_q:
            assert a == pytest.approx(round(adc[vid], 6), abs=1e-6)


def test_reranked_recall_clears_floor(spark, fixture_matrix, trained):
    """Production surface: ADC shortlist + exact re-rank vs exact L2."""
    C, _ = trained
    out = pq_topk(spark, _emb(spark, SF_DIR_SMALL), C).collect()
    recalls = []
    for q in range(PQ_QUERIES):
        exact = _seq_d2(fixture_matrix, fixture_matrix[q])
        exact[q] = np.inf
        true10 = set(np.argsort(exact, kind="stable")[:10])
        got_q = {r["vec_id"]: r["d2"] for r in out if r["query_id"] == q}
        assert len(got_q) == 10
        # re-ranked distances are the EXACT distances (round-6 grid)
        for vid, d2 in got_q.items():
            assert d2 == pytest.approx(round(exact[vid], 6), abs=1e-6)
        recalls.append(len(true10 & set(got_q)) / 10)
    assert min(recalls) >= PQ_RECALL_FLOOR, recalls


def test_deterministic_rerun(spark, trained):
    C1, n1 = trained
    C2, n2 = pq_train(_emb(spark, SF_DIR_SMALL))
    assert np.array_equal(C1, C2)
    assert np.array_equal(n1, n2)
