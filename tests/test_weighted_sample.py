"""Systematic weighted sampling: the invariants the oracle hash can't state.

The oracle gate certifies the exact row set; these tests pin the
SEMANTICS — draw-count conservation, the heavy-doc guarantee, and
proportionality — on both the fixture and a planted skewed corpus.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from conftest import SF_DIR_ORACLE
from data_ingestion_backend_spark.operators.mlprep import (
    WEIGHTED_SAMPLE_K,
    prep_sample_weighted,
)
from data_ingestion_backend_spark.sources.fixtures import load_table


def test_draws_conserved_and_positive(spark):
    """Exactly k grid points exist, each lands in one doc's interval, so
    Σ n_draws == k and every selected doc has n_draws ≥ 1."""
    out = prep_sample_weighted(spark, SF_DIR_ORACLE)
    agg = out.agg(
        F.sum("n_draws").alias("total"), F.min("n_draws").alias("mn")
    ).collect()[0]
    assert agg["total"] == WEIGHTED_SAMPLE_K
    assert agg["mn"] >= 1


def test_heavy_doc_always_selected(spark, tmp_path):
    """A doc with weight > W/k covers ≥1 grid point wherever the
    permutation places it — certainty selection, with multiplicity
    ≈ k·w/W (floor/ceil within 1)."""
    # one whale (w=10_000) among 100 minnows (w=10): W=11_000, W/k=220
    n = [10_000] + [10] * 100
    pq.write_table(
        pa.table({"doc_id": list(range(len(n))), "n_chars": n}),
        str(tmp_path / "documents.parquet"),
    )
    rows = {r["doc_id"]: r["n_draws"] for r in
            prep_sample_weighted(spark, str(tmp_path)).collect()}
    assert 0 in rows, "heavy doc missed — systematic guarantee broken"
    expect = WEIGHTED_SAMPLE_K * n[0] / sum(n)  # ≈ 45.5
    assert abs(rows[0] - expect) <= 1
    assert sum(rows.values()) == WEIGHTED_SAMPLE_K


def test_proportionality_on_fixture(spark):
    """Selected docs' mean weight must exceed the corpus mean weight —
    the weakest version of 'probability ∝ weight' that is deterministic
    under the fixed md5 permutation."""
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    # weight each selected doc by its multiplicity: heavy docs dominate
    sel = prep_sample_weighted(spark, SF_DIR_ORACLE)
    drawn_mean = (
        sel.agg(
            (F.sum(F.col("w") * F.col("n_draws")) / F.sum("n_draws")).alias("m")
        ).collect()[0]["m"]
    )
    assert drawn_mean > corpus_mean
