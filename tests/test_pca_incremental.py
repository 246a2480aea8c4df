"""Incremental PCA state: build 80% + append 20% ≡ monolithic fit.

Same contract as the persisted BM25/IVF indexes — maintained, not
rebuilt — with the documented float-merge caveat: Gram sums agree with
the rebuild to 1e-9 (merge-order ulps), and the rounded eigenvectors
downstream are identical.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.similarity import (
    PCA_STATE_TABLE,
    _emb,
    append_to_pca_state,
    build_pca_state,
    pca_fit,
    pca_fit_from_state,
)
from data_ingestion_backend_spark.sources.warehouse import Warehouse
from tests.conftest import SF_DIR_SMALL


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def test_append_equals_monolithic_fit(spark, wh):
    emb = _emb(spark, SF_DIR_SMALL)
    old = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)

    build_pca_state(wh, old)
    append_to_pca_state(wh, batch)

    mu_inc, V_inc = pca_fit_from_state(wh)
    mu_full, V_full = pca_fit(emb)
    # grid-rounded outputs are identical — the 1e-9 Gram merge drift
    # disappears under PCA_ROUND
    assert np.array_equal(mu_inc, mu_full)
    assert np.array_equal(V_inc, V_full)

    # raw merged Gram agrees with a from-scratch state to float-merge
    # tolerance (the documented caveat, asserted at its claimed bound)
    merged = {
        (r["i"], r["j"]): r["g"] for r in wh.read(PCA_STATE_TABLE).collect()
    }
    build_pca_state(wh, emb)  # overwrite with the monolithic state
    rebuilt = {
        (r["i"], r["j"]): r["g"] for r in wh.read(PCA_STATE_TABLE).collect()
    }
    assert set(merged) == set(rebuilt)
    for k, v in rebuilt.items():
        assert abs(merged[k] - v) <= 1e-9 * max(1.0, abs(v)), k


def test_first_append_is_the_build(spark, wh):
    emb = _emb(spark, SF_DIR_SMALL)
    append_to_pca_state(wh, emb)  # state never built: reads as empty
    mu, V = pca_fit_from_state(wh)
    mu_full, V_full = pca_fit(emb)
    assert np.array_equal(mu, mu_full)
    assert np.array_equal(V, V_full)


def test_redelivered_batch_is_rejected(spark, wh):
    emb = _emb(spark, SF_DIR_SMALL)
    old = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    build_pca_state(wh, old)
    append_to_pca_state(wh, batch, batch_id=7)
    v_after = wh.current_version(PCA_STATE_TABLE)
    append_to_pca_state(wh, batch, batch_id=7)  # re-delivery: no-op
    assert wh.current_version(PCA_STATE_TABLE) == v_after
    mu_inc, V_inc = pca_fit_from_state(wh)
    mu_full, V_full = pca_fit(emb)
    assert np.array_equal(mu_inc, mu_full)
    assert np.array_equal(V_inc, V_full)
