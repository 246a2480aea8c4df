"""Semantics goldens for the deterministic sharded epoch shuffle.

The differential gate certifies the fixed-seed registry form vs DuckDB;
these pin the permutation PROPERTIES across seeds (the part a single
oracle run cannot see): completeness, contiguity, reproducibility, and
that a different seed actually reshuffles.
"""

from __future__ import annotations

from data_ingestion_backend_spark.operators.mlprep import (
    EPOCH_SHARDS,
    epoch_shuffle,
)
from data_ingestion_backend_spark.sources.fixtures import load_table
from tests.conftest import SF_DIR_SMALL


def _perm(spark, seed):
    docs = load_table(spark, SF_DIR_SMALL, "documents")
    return {
        r.doc_id: (r.shard, r.pos)
        for r in epoch_shuffle(docs, seed).collect()
    }


def test_epoch_permutation_properties(spark):
    p1 = _perm(spark, "ep1")
    docs = {
        r.doc_id
        for r in load_table(spark, SF_DIR_SMALL, "documents")
        .select("doc_id")
        .collect()
    }
    # complete: every doc placed exactly once
    assert set(p1) == docs
    # contiguous: within each shard, positions are 0..n_shard-1
    by_shard = {}
    for shard, pos in p1.values():
        by_shard.setdefault(shard, []).append(pos)
    assert set(by_shard) <= set(range(EPOCH_SHARDS))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    # reproducible: same seed, same permutation
    assert _perm(spark, "ep1") == p1
    # a different epoch seed genuinely reshuffles
    p2 = _perm(spark, "ep2")
    assert p2 != p1
    moved = sum(1 for d in docs if p1[d] != p2[d])
    assert moved > len(docs) * 0.9
