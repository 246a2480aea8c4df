"""Physical-plan regression tests: the plans must stay scale-shaped.

Each assertion encodes a 100 TB design requirement (SURVEY §4): losing a
pushed filter, a broadcast, or a partial aggregate is a performance
regression even when results stay correct.
"""

from __future__ import annotations

import re

import pytest

from data_ingestion_backend_spark.plans.audit import (
    formatted_plan,
    has_operator,
    pushed_filters,
    read_schemas,
)
from data_ingestion_backend_spark.operators.queries import STANDALONE_QUERIES
from data_ingestion_backend_spark.registry import QUERIES
from tests.conftest import SF_DIR_ORACLE


@pytest.fixture(scope="module")
def q(spark):
    def build(name):
        fn = QUERIES.get(name) or STANDALONE_QUERIES[name]
        return fn(spark, SF_DIR_ORACLE)

    return build


def test_filter_and_projection_pushdown(q):
    df = q("q01_projection_filter")
    pf = " ".join(pushed_filters(df))
    # both conjuncts reach the parquet scan: membership + equality (the
    # formatted plan truncates the filter list, so assert on the column
    # names that made it into the pushed set rather than full literals)
    assert "In(o_orderstatus" in pf
    assert "o_orderpriority" in pf
    # 9-column orders: scan must read only the 3 needed columns
    assert all(len(s.split(",")) <= 3 for s in read_schemas(df))


def test_q12_partial_aggregation_and_pushdown(q):
    df = q("q12_pricing_summary")
    plan = formatted_plan(df)
    assert "LessThanOrEqual(l_shipdate" in " ".join(pushed_filters(df))
    # partial+final pairs: two HashAggregates around one exchange
    assert plan.count("HashAggregate") >= 2
    # 11-column lineitem: only the 6 needed columns reach the scan
    assert all(len(s.split(",")) <= 6 for s in read_schemas(df))


def test_join_strategies(q):
    # bounded dims must broadcast, not shuffle
    assert has_operator(q("q08_multiway_join"), "BroadcastHashJoin")
    # semi/anti rewrites stay joins, never subquery loops (both arms of
    # the consolidated q10 cert)
    plan = formatted_plan(q("q10_semi_anti_join"))
    assert "Semi" in plan
    assert "Anti" in plan


def test_topk_is_take_ordered(q):
    # orderBy+limit must plan as TakeOrderedAndProject (no global sort)
    assert has_operator(q("q03_topk"), "TakeOrderedAndProject")
    assert has_operator(q("dedup_embedding_topk_pairs"), "TakeOrderedAndProject")


# Arrow-batched pandas stages that are the DESIGNED hot path, not a
# regression: media decode (binary columns) and dense linear algebra
# (blocked-GEMM cosine, LSH signatures, IVF assignment) where vectorized
# numpy beats row expressions.
SANCTIONED_PANDAS = {
    "media_features",
    "dedup_embedding_topk_pairs",
    "sim_ann_topk",
    # standalone registry members with sanctioned Arrow stages: the IVF
    # quantizer (GEMM assignment) and the media decode/resize/frame
    # kernels are the documented mapInPandas surfaces
    "dedup_semantic",
    "media_resize",
    "media_frame_sample",
    # round-12: the REAL decode path (PPM/BMP/WAV kernels + the
    # blob-fixture generator) is the same documented map-only Arrow
    # media surface; byte-exact hand-blob goldens + a full DuckDB
    # differential in test_multimodal.py
    "media_decode",
    # round-8: the PCA pair's Gram partials and projection are the same
    # documented Arrow-batched GEMM surface as the IVF quantizer
    "emb_gram_matrix",
    "emb_pca_project",
    # round-9: the production BPE encode greedy-encodes the distinct
    # word vocabulary in one Arrow stage against a broadcast merge-rank
    # dict (replacing ~merges/3 sequential Catalyst fold jobs) — the
    # documented mapInPandas surface; bit-equality with the fold form
    # is pinned in test_text_bpe.py
    "text_bpe_encode",
    # round-9: IVFADC composes the IVF quantizer's GEMM assignment and
    # the keyed ADC-table builder — both already-sanctioned Arrow GEMM
    # surfaces (numpy end-to-end differential in test_ivfadc.py)
    "sim_ivfadc_topk",
    # round-11: the search-only bench splits run the SAME sanctioned
    # Arrow stages as their train+search parents (query assignment /
    # ADC over the persisted index), minus training
    "sim_ivfadc_search",
    "sim_pq_search",
    # round-14: the hybrid dense arm's cosine candidate kernel is the
    # same sanctioned dense-linear-algebra surface as the blocked-GEMM
    # cosine entries above — the kernel's doubles are pinned
    # BIT-identical to the Catalyst fold it replaced and the pruned
    # ranking identical to the full-window twin (test_search.py::
    # test_dense_arrow_candidates_match_catalyst_twin)
    "search_hybrid_rrf",
}


def test_no_python_udfs_anywhere(spark):
    """EVERY registered query except the sanctioned Arrow-batched stages
    must be pure Catalyst: a Python UDF stage (BatchEvalPython /
    ArrowEvalPython / MapInPandas) is a hot-path regression even when
    results stay correct."""
    for name, fn in sorted({**QUERIES, **STANDALONE_QUERIES}.items()):
        if name in SANCTIONED_PANDAS:
            continue
        plan = formatted_plan(fn(spark, SF_DIR_ORACLE))
        assert "EvalPython" not in plan and "MapInPandas" not in plan, name


def test_lang_id_broadcasts_lexicon(q):
    assert has_operator(q("text_lang_id"), "BroadcastHashJoin")


def test_no_static_broadcast_on_unbounded_inputs(spark, q):
    """Inputs that GROW with the data (the test split's n-gram table, a
    user's contact-email set) must not carry a forced broadcast hint —
    at 100 TB a static hint there is a driver OOM.  AQE may still choose
    to broadcast at runtime when the actual size fits; that choice is
    invisible to the analyzed logical plan this inspects."""
    from data_ingestion_backend_spark.models import SCHEMAS
    from data_ingestion_backend_spark.operators.validate import validate_staging
    from data_ingestion_backend_spark.plans.audit import static_broadcast_hints

    assert static_broadcast_hints(q("prep_decontaminate")) == 0

    staging = spark.createDataFrame([], SCHEMAS["staging"])
    contacts = spark.createDataFrame([], SCHEMAS["contacts"])
    result = validate_staging(staging, contacts, user_id=1)
    assert static_broadcast_hints(result.staging) == 0

    # the bounded-by-construction lexicon broadcast stays static (control)
    assert static_broadcast_hints(q("text_lang_id")) == 1


def test_range_join_stays_hash_join(q):
    """The binned rewrite exists to keep the interval join an equi-join:
    a nested-loop/cartesian plan here is the exact failure mode it guards
    against."""
    plan = formatted_plan(q("q32_range_join"))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_asof_and_range_window_single_shuffle(q):
    # union+window as-of and the RANGE-frame count must each plan ONE
    # hash shuffle (the user_id repartition) — no join, no second data
    # shuffle; the only other exchange is the presentation ORDER BY's
    # rangepartitioning.
    for name in ("q31_asof_join", "q36_sliding_range_count"):
        plan = formatted_plan(q(name))
        assert plan.count("hashpartitioning") == 1, name
        assert "Join" not in plan, name


def _expand_inputs(plan: str) -> list[str]:
    """Return the Input list of every Expand node in a formatted plan."""
    import re

    inputs = []
    for m in re.finditer(r"\(\d+\) Expand\n(Input[^\n]*)", plan):
        inputs.append(m.group(1))
    return inputs


def test_cube_two_phase_expand_only_on_detail(q):
    # q38 mirrors q33's two-phase shape: the Expand that implements the
    # grouping tiers must consume the (tiny) detail AGGREGATE — never the
    # raw scan (native .cube() on the table quadruples shuffle input).
    plan = formatted_plan(q("q38_cube"))
    expands = _expand_inputs(plan)
    assert expands, "cube lost its grouping-tier Expand entirely?"
    for inp in expands:
        assert "sum_qty" in inp and "l_quantity" not in inp, (
            "Expand consumes raw rows — the two-phase rewrite regressed"
        )
    # two partial+final pairs: detail aggregation + tier re-aggregation
    assert plan.count("HashAggregate") >= 4


def test_fact_joins_use_shuffle_hash(q):
    # q28/q29's lineitem⋈orders must stay a shuffled hash join — falling
    # back to sort-merge re-adds two O(n log n) sorts nobody consumes.
    for name in ("q28_shipping_priority", "q29_regional_revenue"):
        plan = formatted_plan(q(name))
        assert "ShuffledHashJoin" in plan, name


def test_salted_agg_two_tiers(q):
    # The salted path must keep both aggregation tiers (per-salt partial,
    # then recombine) — collapsing them re-creates the hot-key reducer.
    plan = formatted_plan(q("scale_salted_user_totals"))
    assert plan.count("HashAggregate") >= 4  # 2 tiers × (partial+final)


def test_rollup_two_phase_expand_only_on_detail(q):
    # q33 is a two-phase rollup: the base groupBy keeps its partial+final
    # hash-aggregate pair around the one big shuffle, and the Expand that
    # implements the subtotal tiers consumes the tiny detail aggregate —
    # never the raw scan (native .rollup() triples shuffle input).
    plan = formatted_plan(q("q33_rollup"))
    for inp in _expand_inputs(plan):
        assert "sum_qty" in inp and "l_quantity" not in inp
    assert plan.count("HashAggregate") >= 4


def test_merged_rollup_cube_cert_two_phase(q):
    # the driver-graded tagged union must keep the same two-phase shape in
    # both arms
    plan = formatted_plan(q("q33_rollup_cube"))
    expands = _expand_inputs(plan)
    assert expands
    for inp in expands:
        assert "sum_qty" in inp and "l_quantity" not in inp


def test_bloom_pruned_join_probes_are_broadcast_semi(q):
    # The bloom gate must stay K map-side broadcast LEFT SEMI probes on
    # the fact — if any probe degrades to a shuffle (or the explode+
    # groupBy verdict shape sneaks in), the pruning costs more than the
    # join it is saving.
    from data_ingestion_backend_spark.operators.sketches import BLOOM_K

    import re

    plan = formatted_plan(q("scale_bloom_pruned_join"))
    assert plan.count("BroadcastHashJoin LeftSemi") >= BLOOM_K
    assert "Expand" not in plan
    # the FACT is scanned exactly once — only the (small, by contract)
    # build side may be re-derived per probe
    locs = re.findall(r"Location.*?(\w+)\.parquet", plan)
    assert locs.count("lineitem") == 1


def test_gram_matrix_partial_aggregation(q):
    """The Gram matrix's scale claim: per-batch GEMM partials are
    map-side combined, so the exchange carries d²-bounded rows — the
    plan must show the partial/final HashAggregate pair around one
    exchange and NO corpus explode (the d²-per-row Generate shape)."""
    plan = formatted_plan(q("emb_gram_matrix"))
    assert plan.count("HashAggregate") >= 2
    assert "Generate" not in plan  # no posexplode of the corpus
    assert "MapInPandas" in plan  # the sanctioned GEMM stage


def test_epoch_shuffle_window_is_partitioned(q):
    """The epoch shuffle must never fall into the single-partition
    global-window shape: its exchange hash-partitions by the shard
    expression, not SinglePartition."""
    plan = formatted_plan(q("prep_epoch_shuffle"))
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_lm_surprisal_single_corpus_pass(q):
    """The bigram LM's four consumers (per-doc arm, c12, c1, V) must all
    read the persisted grams table, not re-run the tokenize+explode
    pipeline: one DISTINCT parquet scan node (repeated renderings of the
    same cached InMemoryRelation don't count), four InMemoryTableScans."""
    plan = formatted_plan(q("text_lm_surprisal"))
    scan_nodes = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scan_nodes) <= 1
    assert plan.count("InMemoryTableScan") >= 4


def test_decon_fuzzy_reuses_memoized_signatures(q):
    """Fuzzy decontamination shares the minhash family's session-memoized
    per-doc signature table: every arm (train bands, held-out bands, both
    verify sides) reads the cache, never a fresh corpus pipeline."""
    plan = formatted_plan(q("prep_decontaminate_fuzzy"))
    scan_nodes = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scan_nodes) <= 1
    assert plan.count("InMemoryTableScan") >= 4
