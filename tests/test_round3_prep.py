"""Golden tests for round-3 prep operators: chunking, domain mix,
int8 quantization, semantic dedup.

The oracled forms (prep_chunk_docs, prep_domain_cap, emb_quantize_int8)
get cross-engine equality from test_oracle_queries; these tests pin the
*semantics* — coverage/quota/error-bound properties no row-hash shows.
"""

from __future__ import annotations

import math

import pytest

from data_ingestion_backend_spark.operators.mlprep import (
    CHUNK_CHARS,
    CHUNK_STRIDE,
    DOMAIN_CAP,
    mix_to_targets,
    prep_chunk_docs,
    prep_domain_cap,
)
from data_ingestion_backend_spark.operators.similarity import (
    quantize_vec,
    semantic_dedup_fixture,
)
from data_ingestion_backend_spark.sources.fixtures import load_table
from tests.conftest import SF_DIR_ORACLE


def test_chunking_covers_documents(spark):
    docs = {
        r.doc_id: r.n_chars
        for r in load_table(spark, SF_DIR_ORACLE, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    chunks: dict[int, list] = {}
    for r in prep_chunk_docs(spark, SF_DIR_ORACLE).collect():
        chunks.setdefault(r.doc_id, []).append(r)
    assert set(chunks) == set(docs)
    for doc_id, rows in chunks.items():
        n = docs[doc_id]
        rows.sort(key=lambda r: r.chunk_idx)
        expected = max(1, math.floor((n - 1) / CHUNK_STRIDE) + 1) if n else 1
        assert len(rows) == expected
        # strided starts, full coverage to the document end
        for i, r in enumerate(rows):
            assert r.chunk_start == i * CHUNK_STRIDE
            assert r.chunk_len <= CHUNK_CHARS
        last = rows[-1]
        if n:
            assert last.chunk_start + last.chunk_len == n


def test_domain_cap_quota(spark):
    rows = prep_domain_cap(spark, SF_DIR_ORACLE).collect()
    per_source: dict[str, list] = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r)
    for src, rs in per_source.items():
        kept = [r for r in rs if r.kept == 1]
        assert len(kept) == min(DOMAIN_CAP, len(rs))
        # kept rows are exactly the lowest ranks
        assert {r.src_rank for r in kept} == set(
            range(1, min(DOMAIN_CAP, len(rs)) + 1)
        )


def test_mix_to_targets_quota_and_determinism(spark):
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    targets = {"src0": 3.0, "src1": 1.0, "src2": 1.0}
    a = mix_to_targets(docs, targets).collect()
    b = mix_to_targets(docs, targets).collect()
    assert sorted((r.doc_id for r in a)) == sorted((r.doc_id for r in b))
    counts: dict[str, int] = {}
    for r in a:
        counts[r.source] = counts.get(r.source, 0) + 1
    assert set(counts) == set(targets)
    # the binding source keeps everything; others keep floor(w_s * T)
    src_n = {
        r.source: r.n
        for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    total_w = sum(targets.values())
    t_max = min(src_n[s] / (w / total_w) for s, w in targets.items())
    for s, w in targets.items():
        assert counts[s] == math.floor((w / total_w) * t_max)


def test_quantize_preserves_cosine(spark):
    emb = load_table(spark, SF_DIR_ORACLE, "embeddings").limit(60)
    rows = quantize_vec(emb, "embedding").collect()
    import numpy as np

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    vecs = [(np.asarray(r.embedding, dtype=np.float64), r.q_vec, r.q_scale) for r in rows]
    for x, q, sc in vecs:
        assert all(-127 <= v <= 127 for v in q)
        assert sc == pytest.approx(float(np.max(np.abs(x))), rel=1e-5)
    worst = 0.0
    for i in range(0, 40, 2):
        x, qx, sx = vecs[i]
        y, qy, sy = vecs[i + 1]
        dq_x = np.asarray(qx, dtype=np.float64) * sx / 127.0
        dq_y = np.asarray(qy, dtype=np.float64) * sy / 127.0
        worst = max(worst, abs(cos(x, y) - cos(dq_x, dq_y)))
    assert worst < 0.02


def test_semantic_dedup_matches_duckdb_oracle(spark):
    """Differential oracle for semantic dedup (the one dedup-family
    operator with no static SQL text): the deterministic sample-fit
    centroids are shared as a control-plane table (16×64 doubles), and
    DuckDB independently recomputes the data plane — per-vector cosine
    assignment with the argmax/tiebreak contract, then the per-cluster
    canonical-representative window — over the same fixtures."""
    from data_ingestion_backend_spark.operators.similarity import (
        _train_centroids_sample,
    )
    from data_ingestion_backend_spark.operators.similarity import _emb
    from tests.oracle_utils import compare_query, duckdb_connection

    emb = _emb(spark, SF_DIR_ORACLE)
    centroids = _train_centroids_sample(emb)

    con = duckdb_connection(SF_DIR_ORACLE)
    try:
        import pandas as pd

        cent_pdf = pd.DataFrame(
            {
                "cluster": range(len(centroids)),
                "ce": [[float(v) for v in c] for c in centroids],
            }
        )
        con.register("centroids", cent_pdf)
        sql = """
        WITH e AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
          FROM embeddings
        ),
        scored AS (
          SELECT e.vec_id, c.cluster,
                 list_cosine_similarity(e.ev, c.ce) AS cos_raw
          FROM e CROSS JOIN centroids c
        ),
        assign AS (
          SELECT vec_id, cluster, cos_raw,
                 ROW_NUMBER() OVER (
                   PARTITION BY vec_id ORDER BY cos_raw DESC, cluster
                 ) AS rn
          FROM scored
        ),
        a AS (
          SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
                 round(cos_raw, 6) AS cos_to_centroid
          FROM assign WHERE rn = 1
        )
        SELECT vec_id, cluster, cos_to_centroid,
               CAST(CASE WHEN ROW_NUMBER() OVER (
                      PARTITION BY cluster
                      ORDER BY cos_to_centroid DESC, vec_id) = 1
                    THEN 1 ELSE 0 END AS INT) AS is_canonical
        FROM a ORDER BY vec_id
        """
        compare_query(semantic_dedup_fixture(spark, SF_DIR_ORACLE), con, sql)
    finally:
        con.close()


def test_semantic_dedup_canonical_properties(spark):
    a = semantic_dedup_fixture(spark, SF_DIR_ORACLE).collect()
    b = semantic_dedup_fixture(spark, SF_DIR_ORACLE).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # deterministic
    by_cluster: dict[int, list] = {}
    for r in a:
        by_cluster.setdefault(r.cluster, []).append(r)
    for rows in by_cluster.values():
        canon = [r for r in rows if r.is_canonical == 1]
        assert len(canon) == 1
        assert canon[0].cos_to_centroid == max(r.cos_to_centroid for r in rows)
