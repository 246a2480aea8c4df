"""Differential golden for full-corpus distributed k-means.

The registry entry is rows-only (Lloyd is iterative, not
SQL-expressible); values are certified here against an independent pure
numpy implementation with the identical determinism pins (first-k init,
spherical mean, centroid rounding), on the real fixture.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_ingestion_backend_spark.operators.similarity import (
    KMEANS_ITERS,
    KMEANS_K,
    KMEANS_ROUND,
    _emb,
    kmeans_train,
)
from tests.conftest import SF_DIR_SMALL


def _numpy_lloyd(M: np.ndarray, k: int, iters: int):
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    C = np.round(M[:k].copy(), KMEANS_ROUND)
    counts = np.zeros(k, dtype=np.int64)
    for _ in range(iters):
        assign = (M @ C.T).argmax(axis=1)
        counts = np.bincount(assign, minlength=k)
        newC = C.copy()
        for j in range(k):
            if counts[j]:
                newC[j] = M[assign == j].mean(axis=0)
        newC /= np.linalg.norm(newC, axis=1, keepdims=True)
        C = np.round(newC, KMEANS_ROUND)
    return C, counts


@pytest.fixture(scope="module")
def fixture_matrix(spark):
    emb = _emb(spark, SF_DIR_SMALL)
    rows = emb.orderBy("vec_id").select("e").toPandas()["e"].tolist()
    return np.asarray(rows, dtype=np.float64)


def test_distributed_lloyd_matches_numpy(spark, fixture_matrix):
    C_spark, n_spark = kmeans_train(_emb(spark, SF_DIR_SMALL))
    C_np, n_np = _numpy_lloyd(fixture_matrix, KMEANS_K, KMEANS_ITERS)
    # The rounding discipline makes each iteration's centroids agree to
    # the rounded grid; assignments (and therefore counts) must match
    # exactly, centroids to the grid resolution.
    assert np.array_equal(n_spark, n_np)
    assert np.allclose(C_spark, C_np, atol=10 ** -(KMEANS_ROUND - 1))
    assert int(n_spark.sum()) == len(fixture_matrix)


def test_registry_table_shape(spark):
    from data_ingestion_backend_spark.operators.queries import (
        STANDALONE_QUERIES,
    )

    df = STANDALONE_QUERIES["sim_kmeans_train"](spark, SF_DIR_SMALL)
    rows = df.collect()
    assert len(rows) == KMEANS_K * 64
    # unit-norm centroids, row-complete membership
    per_cluster = {}
    for r in rows:
        per_cluster.setdefault(r.cluster, []).append(r.centroid)
    for vec in per_cluster.values():
        assert abs(float(np.linalg.norm(vec)) - 1.0) < 1e-6
