"""Session persist-memo (operators/dedup._session_persisted).

The memo key includes a source fingerprint (mtime+size of the entries
under the path): rewriting parquet under a memoized path mid-session
must serve FRESH results and drop the stale cached handle — the trap
the round-5 caveat comment documented is now mechanically removed.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.dedup import (
    _PERSIST_MEMO,
    _session_persisted,
)


def _write(spark, path: str, values: list[int]) -> None:
    spark.createDataFrame([(v,) for v in values], "v bigint").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_memo_serves_cache_then_refreshes_on_rewrite(spark, tmp_path):
    src = str(tmp_path / "data")
    pq = os.path.join(src, "t.parquet")
    _write(spark, pq, [1, 2, 3])

    calls = []

    def build():
        calls.append(1)
        return spark.read.parquet(pq).agg(F.sum("v").alias("s"))

    a = _session_persisted(spark, src, "memo_rewrite_probe", build)
    assert a.collect()[0]["s"] == 6
    # unchanged source: second call is a memo hit (no rebuild)
    b = _session_persisted(spark, src, "memo_rewrite_probe", build)
    assert b is a
    assert len(calls) == 1

    # rewrite the parquet under the memoized path; ensure the mtime moves
    # even on coarse-granularity filesystems
    time.sleep(0.01)
    _write(spark, pq, [10, 20])
    c = _session_persisted(spark, src, "memo_rewrite_probe", build)
    assert len(calls) == 2, "rewritten source must trigger a rebuild"
    assert c.collect()[0]["s"] == 30, "memo served stale data after rewrite"

    # stale handle was dropped from the memo (replaced, not leaked)
    key = (spark.sparkContext.applicationId, src, "memo_rewrite_probe")
    assert _PERSIST_MEMO[key][1] is c
