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


# --------------------------------------------------------------------------
# Preflight audit: flag scale anti-patterns BEFORE a query runs
# --------------------------------------------------------------------------

#: finding codes → human meaning; keep codes stable, tooling keys on them
PREFLIGHT_CODES = {
    "CARTESIAN": "cartesian/nested-loop product — O(n·m) at data scale",
    "PYTHON_UDF": "row-at-a-time Python UDF in the plan — breaks codegen,"
    " ~10-100x slower than built-ins or Arrow-batched pandas UDFs",
    "UNPUSHED_SCAN": "a parquet/ORC scan with a filter above it but no"
    " pushed filters — predicate not reaching the format reader",
    "WIDE_SCAN": "a scan reading every column of a wide table — projection"
    " not pruned",
    "FACT_SORTMERGE": "sort-merge join with no broadcast anywhere — if both"
    " sides are fact-sized this pays two O(n log n) sorts; hint"
    " shuffle_hash when no consumer needs sort order",
}


def preflight(df: DataFrame, wide_cols: int = 12) -> list[dict]:
    """Static scale-risk audit of a DataFrame's physical plan.

    Returns findings ``[{code, detail}, ...]`` — empty means no known
    anti-pattern.  This is the ops-surface twin of tests/test_plans.py:
    the tests pin certified queries' plans at build time; ``preflight``
    lets a PIPELINE AUTHOR check an ad-hoc query before pointing it at
    the 100 TB table.  Heuristics are deliberately conservative (plan
    text only, no cardinality estimates): every code is a "look here",
    not a verdict — e.g. a sort-merge join of a fact against an
    already-sorted bucketed table is fine, and the finding says so.
    """
    plan = formatted_plan(df)
    findings: list[dict] = []
    if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
        findings.append(
            {"code": "CARTESIAN", "detail": PREFLIGHT_CODES["CARTESIAN"]}
        )
    if re.search(r"BatchEvalPython|PythonUDF", plan):
        findings.append(
            {"code": "PYTHON_UDF", "detail": PREFLIGHT_CODES["PYTHON_UDF"]}
        )
    # scans whose pushed list carries no real predicate (IsNotNull guards
    # don't count — Spark pushes those even for opaque expressions) while
    # a residual Filter above does more than null checks
    pushes = pushed_filters(df)

    def _null_guards_only(p: str) -> bool:
        return not [
            e
            for e in p.split(",")
            if e.strip() and not e.strip().startswith("IsNotNull")
        ]

    residual_real_filter = any(
        "Condition :" in line
        and re.search(
            r"(?i)(?<!isnot)null|[<>=]|StartsWith|Contains|md5|like",
            line.split("Condition :", 1)[1].replace("isnotnull", ""),
        )
        for line in plan.splitlines()
        if "Condition :" in line
    )
    # Flag only when NO scan in the plan pushed a real predicate while a
    # real residual filter computes above — in a multi-scan plan, scans
    # with nothing to push (pure join inputs) are normal, and per-scan
    # attribution is not reliable from plan text.
    if pushes and all(_null_guards_only(p) for p in pushes) and residual_real_filter:
        findings.append(
            {
                "code": "UNPUSHED_SCAN",
                "detail": "no scan pushes a real predicate while a residual "
                "filter computes above — "
                f"{PREFLIGHT_CODES['UNPUSHED_SCAN']}",
            }
        )
    wide = [s for s in read_schemas(df) if len(s.split(",")) > wide_cols]
    if wide:
        findings.append(
            {
                "code": "WIDE_SCAN",
                "detail": f"{len(wide)} scan(s) read > {wide_cols} columns — "
                f"{PREFLIGHT_CODES['WIDE_SCAN']}",
            }
        )
    if "SortMergeJoin" in plan and "Broadcast" not in plan:
        findings.append(
            {
                "code": "FACT_SORTMERGE",
                "detail": PREFLIGHT_CODES["FACT_SORTMERGE"],
            }
        )
    return findings
