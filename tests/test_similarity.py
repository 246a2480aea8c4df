"""Extension-operator tests beyond the SQL oracle: ANN recall, dedup sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.similarity import (
    ann_topk_fixture,
)
from data_ingestion_backend_spark.registry import QUERIES
from tests.conftest import SF_DIR_ORACLE


def test_ann_recall_vs_bruteforce(spark):
    """ANN top-10 for 3 queries must recover a healthy share of the exact
    top-10 (random-hyperplane LSH, 16 bits, multi-probe chunks)."""
    exact = QUERIES["sim_multiquery_topk"](spark, SF_DIR_ORACLE).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])

    approx = ann_topk_fixture(spark, SF_DIR_ORACLE, k=10).collect()
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])

    recalls = []
    for qid, want in exact_sets.items():  # exact gives top-5/query
        got = approx_sets.get(qid, set())
        recalls.append(len(want & got) / len(want))
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_ann_deterministic(spark):
    a = sorted(map(tuple, ann_topk_fixture(spark, SF_DIR_ORACLE).collect()))
    b = sorted(map(tuple, ann_topk_fixture(spark, SF_DIR_ORACLE).collect()))
    assert a == b


def test_ivf_recall_vs_bruteforce(spark):
    """IVF (16 cells, 4 probed) must recover a healthy share of the exact
    top-5 per query — near-orthogonal fixture vectors are the hard case
    for a coarse quantizer, so the bar is deliberately moderate."""
    from data_ingestion_backend_spark.operators.similarity import ivf_topk_fixture

    exact = QUERIES["sim_multiquery_topk"](spark, SF_DIR_ORACLE).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx = ivf_topk_fixture(spark, SF_DIR_ORACLE, k=10).collect()
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(want & approx_sets.get(qid, set())) / len(want)
        for qid, want in exact_sets.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_ivf_deterministic(spark):
    from data_ingestion_backend_spark.operators.similarity import ivf_topk_fixture

    a = sorted(map(tuple, ivf_topk_fixture(spark, SF_DIR_ORACLE).collect()))
    b = sorted(map(tuple, ivf_topk_fixture(spark, SF_DIR_ORACLE).collect()))
    assert a == b


def test_signature_gemm_matches_catalyst(spark):
    """GEMM LSH signatures must equal the Catalyst fold bit-for-bit."""
    from data_ingestion_backend_spark.operators.similarity import (
        _emb,
        with_signature,
        with_signature_catalyst,
    )

    emb = _emb(spark, SF_DIR_ORACLE).select("vec_id", "e")
    a = {
        r["vec_id"]: r["sig"]
        for r in with_signature(emb, "e", "sig").collect()
    }
    b = {
        r["vec_id"]: r["sig"]
        for r in with_signature_catalyst(emb, "e", "sig").collect()
    }
    assert a == b


def test_minhash_finds_planted_neardups(spark):
    """The fixture documents contain planted ~0.99-Jaccard pairs; the LSH
    pipeline must surface them (non-vacuous result)."""
    rows = QUERIES["dedup_minhash_lsh"](spark, SF_DIR_ORACLE).collect()
    assert len(rows) >= 5
    assert all(r["jaccard"] >= 0.8 for r in rows)


def test_simhash_pairs_overlap_minhash(spark):
    """SimHash near-dup pairs should substantially overlap the MinHash
    high-Jaccard pairs — two independent algorithms, same planted dups."""
    mh = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_minhash_lsh"](spark, SF_DIR_ORACLE).collect()
        if r["jaccard"] >= 0.95
    }
    sh = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_simhash_pairs"](spark, SF_DIR_ORACLE).collect()
    }
    assert mh, "no high-jaccard pairs found"
    assert len(mh & sh) / len(mh) >= 0.5


def test_clusters_close_pairs_transitively(spark):
    """dedup_clusters must be the transitive closure of the pair list:
    every pair shares a cluster, every cluster id is the component min,
    and non-paired docs are their own singleton cluster."""
    pairs = QUERIES["dedup_minhash_lsh"](spark, SF_DIR_ORACLE).collect()
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in QUERIES["dedup_clusters"](spark, SF_DIR_ORACLE).collect()
    }
    assert pairs, "no near-dup pairs found"
    paired = set()
    for r in pairs:
        assert labels[r["doc_a"]] == labels[r["doc_b"]]
        paired |= {r["doc_a"], r["doc_b"]}
    # cluster id = min member of its component
    from collections import defaultdict

    members = defaultdict(set)
    for doc, lbl in labels.items():
        members[lbl].add(doc)
    for lbl, docs in members.items():
        assert lbl == min(docs)
    # singletons label themselves
    for doc, lbl in labels.items():
        if doc not in paired:
            assert lbl == doc


def test_gemm_pairs_match_catalyst_twin(spark):
    """Blocked-GEMM exact top-k pairs must equal the independent
    pure-Catalyst implementation row for row (same rounding, same order):
    two implementations, one truth."""
    from data_ingestion_backend_spark.operators.dedup import (
        _embedding_topk_pairs_catalyst,
    )

    gemm = [
        tuple(r)
        for r in QUERIES["dedup_embedding_topk_pairs"](
            spark, SF_DIR_ORACLE
        ).collect()
    ]
    cat = [
        tuple(r)
        for r in _embedding_topk_pairs_catalyst(spark, SF_DIR_ORACLE).collect()
    ]
    assert gemm == cat


def test_extension_queries_all_runnable(spark):
    """Every registered extension query returns a well-formed DataFrame."""
    for name in QUERIES:
        if name.split("_")[0] in {"dedup", "sim", "text"}:
            df = QUERIES[name](spark, SF_DIR_ORACLE)
            assert df.columns, name
            df.limit(5).collect()


# --- persisted IVF index -----------------------------------------------------

def test_ivf_persisted_matches_inmemory_and_prunes_partitions(spark, tmp_path):
    """The at-rest index must (a) return exactly what the in-memory IVF
    path returns (same centroids training, same probe fan-out, same
    rerank) and (b) physically touch ONLY the probed cells' directories —
    the partition-pruning claim the ivf_topk docstring makes for 100 TB,
    here proven with input_file_name over a real hive layout."""
    import re

    from pyspark.sql import functions as F

    from data_ingestion_backend_spark.operators.similarity import (
        IVF_CLUSTERS,
        IVF_NPROBE,
        _emb,
        build_ivf_index,
        ivf_search_persisted,
        ivf_topk_fixture,
    )
    from tests.conftest import SF_DIR_ORACLE

    emb = _emb(spark, SF_DIR_ORACLE)
    idx = str(tmp_path / "ivf_index")
    build_ivf_index(spark, idx, emb.select("vec_id", "e"))

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    # pinned to the static probe count: this test certifies persisted ≡
    # in-memory MACHINERY at equal nprobe (the calibrated default is
    # covered by test_ivf_adaptive_nprobe_* below)
    got = ivf_search_persisted(spark, idx, queries, nprobe=IVF_NPROBE)
    want = ivf_topk_fixture(spark, SF_DIR_ORACLE)
    as_set = lambda df: {(r.query_id, r.vec_id, r.cosine) for r in df.collect()}
    assert as_set(got) == as_set(want)
    assert as_set(got), "no results — vacuous"

    # physical pruning: every file read during the candidate scan lives
    # under a probed cluster directory, and fewer than all clusters are hit
    import os

    import numpy as np

    crows = spark.read.parquet(os.path.join(idx, "centroids")).orderBy("cluster").collect()
    C = np.asarray([r["centroid"] for r in crows])
    from data_ingestion_backend_spark.operators.similarity import _assign_clusters

    probes = _assign_clusters(queries, "qe", C, IVF_NPROBE)
    probe_ids = {r["cluster"] for r in probes.select("cluster").distinct().collect()}
    touched = (
        spark.read.parquet(os.path.join(idx, "corpus"))
        .filter(F.col("cluster").isin(sorted(probe_ids)))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    clusters_touched = {
        int(re.search(r"cluster=(\d+)", r["f"]).group(1)) for r in touched
    }
    assert clusters_touched <= probe_ids
    assert len(clusters_touched) < IVF_CLUSTERS, "no pruning happened"


def test_ivf_append_matches_inmemory_and_drift_monitor(spark, tmp_path):
    """Incremental IVF maintenance contract: (a) appending a same-
    distribution batch with the frozen quantizer gives EXACTLY the search
    results of an in-memory IVF over the grown corpus with the index's
    own centroids; (b) the drift monitor stays quiet for that batch but
    fires on a planted distribution shift (a constant offset that
    concentrates the batch away from every learned centroid)."""
    import os

    import numpy as np

    from pyspark.sql import functions as F

    from data_ingestion_backend_spark.operators.similarity import (
        _emb,
        append_to_ivf_index,
        build_ivf_index,
        ivf_search_persisted,
        ivf_topk,
    )
    from tests.conftest import SF_DIR_ORACLE

    emb = _emb(spark, SF_DIR_ORACLE)
    base = emb.filter(F.col("vec_id") % 5 != 0).select("vec_id", "e")
    batch = emb.filter(F.col("vec_id") % 5 == 0).select("vec_id", "e")
    idx = str(tmp_path / "ivf_index")
    build_ivf_index(spark, idx, base)

    res = append_to_ivf_index(spark, idx, batch)
    assert res["retrain"] is False, f"same-distribution batch flagged: {res}"
    assert abs(res["drift"]) < 0.05  # cross-fit baseline: same-dist batch reads ~0 drift

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    got = ivf_search_persisted(spark, idx, queries)  # calibrated default
    crows = (
        spark.read.parquet(os.path.join(idx, "centroids"))
        .orderBy("cluster")
        .collect()
    )
    C = np.asarray([r["centroid"] for r in crows], dtype=np.float64)
    rec = int(
        spark.read.parquet(os.path.join(idx, "stats")).collect()[0][
            "recommended_nprobe"
        ]
    )
    want = ivf_topk(base.unionByName(batch), queries, C, nprobe=rec)
    as_set = lambda df: {(r.query_id, r.vec_id, r.cosine) for r in df.collect()}
    assert as_set(got) == as_set(want)
    assert as_set(got), "no results — vacuous"
    # the appended batch is actually searchable: at least one appended
    # vec can appear in SOME search (structural: its cell grew)
    grown_n = spark.read.parquet(os.path.join(idx, "corpus")).count()
    assert grown_n == base.count() + batch.count()


def test_ivf_drift_trigger_fires_on_shifted_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from data_ingestion_backend_spark.operators.similarity import (
        _emb,
        append_to_ivf_index,
        build_ivf_index,
    )
    from tests.conftest import SF_DIR_ORACLE

    emb = _emb(spark, SF_DIR_ORACLE)
    base = emb.filter(F.col("vec_id") % 5 != 0).select("vec_id", "e")
    idx = str(tmp_path / "ivf_index")
    build_ivf_index(spark, idx, base)

    shifted = (
        emb.filter(F.col("vec_id") % 5 == 0)
        .select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.transform(F.col("e"), lambda x: x + F.lit(3.0)).alias("e"),
        )
    )
    res = append_to_ivf_index(spark, idx, shifted)
    assert res["retrain"] is True, f"planted shift not detected: {res}"
    assert res["drift"] > 0.05


# ---------------------------------------------------------------------------
# adaptive nprobe (calibrated at index build)
# ---------------------------------------------------------------------------


def test_calibrate_nprobe_diffuse_exceeds_clustered():
    """The measured probe count must rise with neighbor diffuseness:
    well-separated blobs keep the cheap static default; a uniform cloud
    (neighbors on Voronoi boundaries) calibrates higher."""
    import numpy as np

    from data_ingestion_backend_spark.operators.similarity import (
        IVF_CLUSTERS,
        IVF_NPROBE,
        _lloyd_spherical,
        calibrate_nprobe,
    )

    rng = np.random.RandomState(7)
    d = 64
    # clustered: 16 far-apart anchors, tiny within-blob noise — every
    # vector and its NN share a blob, so top-1 cell already suffices
    anchors = rng.randn(IVF_CLUSTERS, d) * 10
    blob = np.repeat(anchors, 64, axis=0) + rng.randn(IVF_CLUSTERS * 64, d) * 0.01
    blob /= np.linalg.norm(blob, axis=1, keepdims=True)
    C_blob = _lloyd_spherical(blob)
    p_clustered = calibrate_nprobe(blob, C_blob)

    # diffuse: uniform gaussian cloud — NNs sit across cell boundaries
    cloud = rng.randn(1024, d)
    cloud /= np.linalg.norm(cloud, axis=1, keepdims=True)
    C_cloud = _lloyd_spherical(cloud)
    p_diffuse = calibrate_nprobe(cloud, C_cloud)

    assert p_clustered == IVF_NPROBE, p_clustered
    assert p_diffuse > p_clustered, (p_clustered, p_diffuse)


def test_ivf_adaptive_nprobe_persisted_and_used(spark, tmp_path):
    """build_ivf_index persists the calibrated probe count; the default
    search uses it (results equal the explicit-nprobe call), and a
    pre-calibration index (stats without the column) falls back to the
    static IVF_NPROBE."""
    import os

    from pyspark.sql import functions as F

    from data_ingestion_backend_spark.operators.similarity import (
        IVF_NPROBE,
        _emb,
        build_ivf_index,
        ivf_search_persisted,
    )
    from tests.conftest import SF_DIR_ORACLE

    emb = _emb(spark, SF_DIR_ORACLE).select("vec_id", "e")
    idx = str(tmp_path / "ivf_adaptive")
    build_ivf_index(spark, idx, emb)

    stats = spark.read.parquet(os.path.join(idx, "stats")).collect()[0]
    rec = int(stats["recommended_nprobe"])
    assert rec >= IVF_NPROBE

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    as_set = lambda df: {(r.query_id, r.vec_id, r.cosine) for r in df.collect()}
    assert as_set(ivf_search_persisted(spark, idx, queries)) == as_set(
        ivf_search_persisted(spark, idx, queries, nprobe=rec)
    )

    # legacy index: rewrite stats without the recommended_nprobe column
    legacy = spark.createDataFrame(
        [(float(stats["baseline_mean_cos"]), float(stats["in_index_mean_cos"]), int(stats["n"]))],
        "baseline_mean_cos double, in_index_mean_cos double, n bigint",
    )
    legacy.write.mode("overwrite").parquet(os.path.join(idx, "stats"))
    assert as_set(ivf_search_persisted(spark, idx, queries)) == as_set(
        ivf_search_persisted(spark, idx, queries, nprobe=IVF_NPROBE)
    )


def test_canonical_quality_keeps_longest_per_cluster(spark):
    """dedup_canonical_quality: exactly one keep per cluster, and the
    kept member has the cluster's max token count (ties to lower id) —
    the 'best copy survives' contract, against dedup_clusters' labels."""
    from collections import defaultdict

    from data_ingestion_backend_spark.operators.dedup import (
        dedup_canonical_quality,
    )

    rows = dedup_canonical_quality(spark, SF_DIR_ORACLE).collect()
    clusters = defaultdict(list)
    for r in rows:
        clusters[r["cluster_id"]].append(r)
    assert any(len(m) > 1 for m in clusters.values()), "no non-trivial cluster"
    for cid, members in clusters.items():
        kept = [m for m in members if m["keep"]]
        assert len(kept) == 1, cid
        best = max(members, key=lambda m: (m["n_tokens"], -m["doc_id"]))
        assert kept[0]["doc_id"] == best["doc_id"], cid
    # labels agree with dedup_clusters (same closure)
    from data_ingestion_backend_spark.registry import QUERIES

    lbl = {
        r["doc_id"]: r["cluster_id"]
        for r in QUERIES["dedup_clusters"](spark, SF_DIR_ORACLE).collect()
    }
    assert {r["doc_id"]: r["cluster_id"] for r in rows} == lbl


def test_exact_clique_short_circuit_is_pair_identical(spark):
    """minhash_pairs_short_circuit (r11): banding only exact-dup group
    REPRESENTATIVES must emit exactly the pair set (and Jaccard values)
    of banding every member — planted 4-clique of exact copies, a
    near-dup of the clique text, an unrelated near-dup pair, singletons."""
    from data_ingestion_backend_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _band_table,
        _verify_jaccard,
        minhash_pairs_short_circuit,
        minhash_per_doc_frame,
    )

    base = " ".join(f"w{i}" for i in range(30))
    near = " ".join(f"w{i}" for i in range(29)) + " zz"
    other = " ".join(f"u{i}" for i in range(25))
    other2 = " ".join(f"u{i}" for i in range(24)) + " qq"
    rows = (
        [(i, base) for i in range(4)]          # exact 4-clique
        + [(10, near)]                          # near-dup of the clique
        + [(20, other), (21, other2)]           # unrelated near-dup pair
        + [(30, "lone " + " ".join(f"x{i}" for i in range(20)))]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    per_doc = minhash_per_doc_frame(docs)

    # the naive per-member plan — the graded oracle's shape
    bands = _band_table(per_doc)
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    want = sorted(
        tuple(r)
        for r in _verify_jaccard(per_doc, cand, JACCARD_THRESHOLD).collect()
    )
    got = sorted(
        tuple(r)
        for r in minhash_pairs_short_circuit(docs, per_doc).collect()
    )
    assert got == want
    # the planted structure is actually exercised: all 6 clique pairs at
    # jaccard 1.0, the clique x near-dup pairs, and the unrelated pair
    clique = {(a, b) for a in range(4) for b in range(4) if a < b}
    got_pairs = {(a, b) for a, b, _ in got}
    assert clique <= got_pairs
    assert all(j == 1.0 for a, b, j in got if (a, b) in clique)
    assert {(i, 10) for i in range(4)} <= got_pairs
    assert (20, 21) in got_pairs
