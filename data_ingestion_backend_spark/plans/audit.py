"""Physical-plan audit helpers: assert plans stay scale-shaped.

Correctness tests prove the right rows come back; these helpers prove the
*plan* is the one that survives a 100 TB / 1000-executor scale-up:
filters pushed into the parquet scan, projections pruned, small sides
broadcast, aggregations map-side combined, top-k as TakeOrderedAndProject.
A regression that silently turns a broadcast join into a shuffle join or
un-pushes a filter fails tests/test_plans.py even though results stay
correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    return re.findall(r"ReadSchema: struct<([^>]*)>", formatted_plan(df))


def has_operator(df: DataFrame, op: str) -> bool:
    return op in formatted_plan(df)


def static_broadcast_hints(df: DataFrame) -> int:
    """Count STATIC broadcast hints in the analyzed logical plan.

    A runtime (AQE) broadcast choice is invisible here — this sees only
    ``F.broadcast(...)`` / ``hint('broadcast')`` the query author forced.
    Forced broadcasts on inputs that grow with the data are driver OOMs
    waiting for scale, so plan tests pin the hint count on such paths.
    """
    analyzed = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(r"(?i)ResolvedHint.*broadcast", analyzed))


def assert_scan_pruned(df: DataFrame, table_cols: int, max_cols: int) -> None:
    """Assert at least one scan reads ≤ max_cols of the table's columns."""
    widths = [len(s.split(",")) for s in read_schemas(df)]
    assert widths and min(widths) <= max_cols, (
        f"no scan pruned below {max_cols} cols (widths={widths}, table={table_cols})"
    )
