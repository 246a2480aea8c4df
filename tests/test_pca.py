"""Numpy differential for the distributed PCA pair.

emb_gram_matrix carries its own DuckDB oracle in the uniform gate; here
the eigen step and projection are certified against an independent numpy
PCA on the same fixture, plus structural invariants (orthonormal
components, descending explained variance).
"""

from __future__ import annotations

import numpy as np

from data_ingestion_backend_spark.operators.similarity import (
    PCA_COMPONENTS,
    PCA_ROUND,
    _emb,
    pca_fit,
    pca_project,
)
from tests.conftest import SF_DIR_SMALL


def _matrix(spark):
    rows = (
        _emb(spark, SF_DIR_SMALL)
        .orderBy("vec_id")
        .select("vec_id", "e")
        .collect()
    )
    ids = [r["vec_id"] for r in rows]
    return ids, np.asarray([r["e"] for r in rows], dtype=np.float64)


def test_pca_fit_matches_numpy(spark):
    ids, X = _matrix(spark)
    mu, V = pca_fit(_emb(spark, SF_DIR_SMALL))

    mu_np = X.mean(axis=0)
    C = np.cov(X, rowvar=False, bias=True)
    w, Vn = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:PCA_COMPONENTS]
    w_top, Vn = w[order], Vn[:, order]
    for k in range(Vn.shape[1]):
        jmax = int(np.argmax(np.abs(Vn[:, k])))
        if Vn[jmax, k] < 0:
            Vn[:, k] = -Vn[:, k]

    assert np.allclose(mu, mu_np, atol=10 ** -(PCA_ROUND - 1))
    assert np.allclose(V, Vn, atol=1e-6)
    # structural invariants
    assert np.allclose(V.T @ V, np.eye(PCA_COMPONENTS), atol=1e-6)
    assert np.all(np.diff(w_top) <= 1e-12)  # descending eigenvalues


def test_projection_matches_numpy(spark):
    ids, X = _matrix(spark)
    mu, V = pca_fit(_emb(spark, SF_DIR_SMALL))
    got = {
        r["vec_id"]: np.asarray(r["pc"])
        for r in pca_project(
            _emb(spark, SF_DIR_SMALL).select("vec_id", "e"), "e", mu, V
        ).collect()
    }
    want = np.round((X - mu) @ V, 6)
    assert set(got) == set(ids)
    for i, vid in enumerate(ids):
        assert np.allclose(got[vid], want[i], atol=1e-6), vid
    # projection genuinely concentrates variance: the top component's
    # variance dominates the per-axis mean of the original data
    P = np.stack([got[v] for v in ids])
    assert P[:, 0].var() > (X - mu).var(axis=0).mean()
