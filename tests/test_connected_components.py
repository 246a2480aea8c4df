"""Graph-shape unit tests for the delta-propagation CC loop.

The fixture corpus only ever produces shallow clique-shaped components
(planted near-dup groups converge in 2-3 rounds), so these tests drive
:func:`connected_components` over synthetic edge lists that exercise what
the fixtures can't: long chains (many frontier rounds, shrinking delta),
mixed component shapes, label-direction asymmetry, the empty graph, and
the converge-or-raise bound.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.dedup import connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def _labels(df) -> dict[int, int]:
    return {r["doc_id"]: r["lbl"] for r in df.collect()}


def test_chain_needs_many_delta_rounds(spark):
    # 0-1-2-...-29: min label crosses one hop per round, so the frontier
    # stays alive ~30 rounds while shrinking — the delta bookkeeping has
    # to keep re-activating exactly the wavefront nodes.
    n = 30
    out = _labels(connected_components(_edges(spark, [(i, i + 1) for i in range(n)])))
    assert out == {i: 0 for i in range(n + 1)}


def test_chain_against_label_direction(spark):
    # Reversed ids: the min label lives at the FAR end of every edge's
    # natural direction; propagation must flow through the swapped arm
    # of the undirected union.
    n = 20
    out = _labels(
        connected_components(_edges(spark, [(i + 1, i) for i in range(n)]))
    )
    assert out == {i: 0 for i in range(n + 1)}


def test_mixed_components(spark):
    edges = (
        [(1, 2), (2, 3), (1, 3)]        # triangle → lbl 1
        + [(10, 11)]                      # pair → lbl 10
        + [(20, 21), (21, 22), (22, 23)]  # path → lbl 20
        + [(30, 31), (32, 31), (33, 30)]  # star-ish → lbl 30
    )
    out = _labels(connected_components(_edges(spark, edges)))
    assert out == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20,
        30: 30, 31: 30, 32: 30, 33: 30,
    }


def test_bridged_cliques_collapse(spark):
    # two cliques joined by one bridge edge form ONE component
    a = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
    b = [(i, j) for i in range(100, 104) for j in range(i + 1, 104)]
    out = _labels(connected_components(_edges(spark, a + b + [(4, 100)])))
    assert set(out.values()) == {1}
    assert len(out) == 8


def test_empty_graph(spark):
    df = connected_components(_edges(spark, []))
    assert df.count() == 0
    assert df.columns == ["doc_id", "lbl"]


def test_converge_or_raise_on_deep_chain(spark):
    # diameter exceeds max_rounds → must raise, never return wrong labels
    with pytest.raises(RuntimeError, match="not converged"):
        connected_components(
            _edges(spark, [(i, i + 1) for i in range(10)]), max_rounds=3
        )


def test_duplicate_and_self_edges_harmless(spark):
    edges = [(1, 2), (1, 2), (2, 1), (3, 3), (2, 3)]
    out = _labels(connected_components(_edges(spark, edges)))
    assert out == {1: 1, 2: 1, 3: 1}


def _union_find_components(edges):
    """Independent oracle: driver-side union-find (path compression)."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_random_graphs_match_union_find(spark, seed):
    # seeded sparse random graphs: mixed component count/shape/diameter,
    # checked against a completely independent sequential algorithm
    import random

    rng = random.Random(seed)
    n, m = 80, 70
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(m)
    ]
    expected = _union_find_components(edges)
    got = _labels(connected_components(_edges(spark, edges)))
    assert got == expected


def test_repeated_calls_stable_and_self_cleaning(spark):
    # Repeated calls must converge identically AND release their own
    # persists (the round-4 "already cached" churn this module was
    # rebuilt to avoid): the result frame is an eager localCheckpoint,
    # valid after the loop's cache entries are gone.
    edges = _edges(spark, [(1, 2), (2, 3)])
    results = [_labels(connected_components(edges)) for _ in range(3)]
    assert results[0] == results[1] == results[2] == {1: 1, 2: 1, 3: 1}


# --------------------------------------------------------------------------
# Incremental maintenance (cc_incremental)
# --------------------------------------------------------------------------


def test_incremental_bridges_old_components(spark):
    from data_ingestion_backend_spark.operators.dedup import cc_incremental

    old = _edges(spark, [(1, 2), (2, 3), (10, 11), (20, 21)])
    labels = connected_components(old)
    assert _labels(labels) == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    # one new edge bridges {1,2,3} and {10,11}; another attaches a brand
    # new node 30 to {20,21}
    new = _edges(spark, [(3, 10), (21, 30)])
    got = _labels(cc_incremental(labels, new))
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 20: 20, 21: 20, 30: 20}


def test_incremental_empty_labeling_is_full_cc(spark):
    from data_ingestion_backend_spark.operators.dedup import cc_incremental

    labels = connected_components(_edges(spark, []))
    new = _edges(spark, [(5, 6), (6, 7)])
    assert _labels(cc_incremental(labels, new)) == {5: 5, 6: 5, 7: 5}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_incremental_matches_full_rebuild_on_random_graphs(spark, seed):
    """The maintenance contract: labels(old) + batch == full CC over
    old ∪ batch, for random graphs and random splits — the same oracle
    discipline as the union-find differential above."""
    import random

    from data_ingestion_backend_spark.operators.dedup import cc_incremental

    rng = random.Random(seed)
    n = 60
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(70)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    cut = len(edges) * 4 // 5
    old, new = edges[:cut], edges[cut:]

    labels_old = connected_components(_edges(spark, old))
    got = _labels(cc_incremental(labels_old, _edges(spark, new)))
    want = _labels(connected_components(_edges(spark, edges)))
    assert got == want


@pytest.mark.parametrize("seed", [3, 4])
def test_incremental_driver_fastpath_equals_distributed(spark, seed):
    """The small-graph union-find fast path and the distributed delta
    propagation must label identically — the fast path is an execution
    strategy, never a semantics change.  Runs the same random
    (old labeling + batch) workload through BOTH arms by flipping
    CC_DRIVER_EDGE_LIMIT, including a limit of 1 (probe overflows →
    distributed arm even for a small graph, pinning the abandon
    branch)."""
    import random

    from data_ingestion_backend_spark.operators import dedup
    from data_ingestion_backend_spark.operators.dedup import cc_incremental

    rng = random.Random(100 + seed)
    n = 40
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(50)]
    edges = [(a, b) for a, b in edges if a != b]
    cut = len(edges) * 3 // 4
    labels_old = connected_components(_edges(spark, edges[:cut]))
    new = _edges(spark, edges[cut:])

    orig = dedup.CC_DRIVER_EDGE_LIMIT
    try:
        dedup.CC_DRIVER_EDGE_LIMIT = 20_000
        fast = _labels(cc_incremental(labels_old, new))
        dedup.CC_DRIVER_EDGE_LIMIT = 0  # disabled: distributed arm
        dist = _labels(cc_incremental(labels_old, new))
        dedup.CC_DRIVER_EDGE_LIMIT = 1  # probe overflow: distributed arm
        overflow = _labels(cc_incremental(labels_old, new))
    finally:
        dedup.CC_DRIVER_EDGE_LIMIT = orig
    assert fast == dist == overflow
    assert fast == _labels(connected_components(_edges(spark, edges)))
