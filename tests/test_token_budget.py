"""Token-budget selection: the histogram-decomposed selection must equal
the naive greedy loop exactly (prefix semantics — an overflowing doc
blocks everything after it in the order), on the fixture and on planted
boundary cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.mlprep import (
    BUDGET_PCT,
    prep_token_budget_select,
    token_budget_select,
)
from tests.conftest import SF_DIR_ORACLE


def test_matches_naive_greedy_on_fixture(spark):
    got = prep_token_budget_select(spark, SF_DIR_ORACLE).collect()
    rows = [(r["doc_id"], r["score"], r["n_tokens"]) for r in got]
    budget = sum(r[2] for r in rows) * BUDGET_PCT // 100
    # reference: strict prefix — walk the order and STOP at first overflow
    picked = set()
    used = 0
    for doc_id, score, n in sorted(rows, key=lambda r: (-r[1], r[0])):
        if used + n > budget:
            break
        picked.add(doc_id)
        used += n
    assert {r["doc_id"] for r in got if r["selected"]} == picked
    assert used <= budget


def test_overflow_doc_blocks_later_docs(spark):
    """Planted boundary: budget fits doc A, not A+B; C (lower in order)
    would fit the slack but must stay excluded — prefix, not best-fit."""
    scored = spark.createDataFrame(
        [(1, 10, 50), (2, 9, 60), (3, 8, 5)],
        "doc_id long, score long, n_tokens long",
    )
    got = {r["doc_id"]: r["selected"] for r in token_budget_select(scored, 70).collect()}
    assert got == {1: True, 2: False, 3: False}


def test_tie_scores_admit_by_doc_id(spark):
    scored = spark.createDataFrame(
        [(5, 7, 30), (2, 7, 30), (9, 7, 30)],
        "doc_id long, score long, n_tokens long",
    )
    got = {r["doc_id"]: r["selected"] for r in token_budget_select(scored, 60).collect()}
    assert got == {2: True, 5: True, 9: False}


def test_zero_and_full_budget(spark):
    scored = spark.createDataFrame(
        [(1, 3, 10), (2, 2, 10)], "doc_id long, score long, n_tokens long"
    )
    none = token_budget_select(scored, 0).collect()
    assert not any(r["selected"] for r in none)
    full = token_budget_select(scored, 20).collect()
    assert all(r["selected"] for r in full)


# ---------------------------------------------------------------------------
# leakage-free split (cluster-keyed assignment)
# ---------------------------------------------------------------------------


def test_leakage_free_split_never_straddles_clusters(spark):
    """Every near-dup cluster lands whole on one side; singleton docs
    get the IDENTICAL assignment the doc-level split gives them — the
    two splits differ only where leakage would have occurred."""
    from collections import defaultdict

    from data_ingestion_backend_spark.operators.mlprep import (
        prep_split_assign,
        prep_split_leakage_free,
    )

    rows = prep_split_leakage_free(spark, SF_DIR_ORACLE).collect()
    by_cluster = defaultdict(set)
    singles = defaultdict(int)
    for r in rows:
        by_cluster[r["cluster_id"]].add(r["split"])
        singles[r["cluster_id"]] += 1
    assert all(len(v) == 1 for v in by_cluster.values())
    assert any(n > 1 for n in singles.values()), "no non-trivial cluster"

    doc_level = {
        r["doc_id"]: r["split"]
        for r in prep_split_assign(spark, SF_DIR_ORACLE).collect()
    }
    for r in rows:
        if singles[r["cluster_id"]] == 1 and r["cluster_id"] == r["doc_id"]:
            assert r["split"] == doc_level[r["doc_id"]], r["doc_id"]


def test_leakage_free_split_deterministic(spark):
    from data_ingestion_backend_spark.operators.mlprep import (
        prep_split_leakage_free,
    )

    a = [tuple(r) for r in prep_split_leakage_free(spark, SF_DIR_ORACLE).collect()]
    b = [tuple(r) for r in prep_split_leakage_free(spark, SF_DIR_ORACLE).collect()]
    assert a == b


def test_token_budget_randomized_vs_naive_greedy(spark):
    """Seeded randomized differential: 300 docs with colliding scores
    and varied sizes, 7 budgets spanning empty → full — histogram
    decomposition ≡ the naive sort-accumulate-stop loop at every
    boundary."""
    import random

    rng = random.Random(11)
    rows = [
        (i, rng.randint(0, 6), rng.randint(1, 40)) for i in range(300)
    ]
    scored = spark.createDataFrame(
        rows, "doc_id long, score long, n_tokens long"
    )
    total = sum(r[2] for r in rows)
    for budget in [0, 1, total // 10, total // 3, total // 2, total - 1, total]:
        got = {
            r["doc_id"]
            for r in token_budget_select(scored, budget).collect()
            if r["selected"]
        }
        want = set()
        used = 0
        for doc_id, score, n in sorted(rows, key=lambda r: (-r[1], r[0])):
            if used + n > budget:
                break
            want.add(doc_id)
            used += n
        assert got == want, budget
