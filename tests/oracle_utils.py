"""Differential-oracle comparison utilities (mirrors the driver's t2 gate).

Compare a Spark DataFrame result against DuckDB running the oracle SQL on
the same parquet fixtures: row count, column-name set, and an
order-insensitive comparison of canonicalized values.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb

from data_ingestion_backend_spark.sources.fixtures import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon(v):
    """Canonicalize one cell so Spark and DuckDB values compare equal."""
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v.normalize()}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v:.10g}"
    if isinstance(v, _dt.datetime):
        return "t:" + v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return "t:" + _dt.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, int):
        return f"i:{v}"
    return f"s:{v}"


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_query(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Assert Spark result == DuckDB oracle result (order-insensitive)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row-count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_canon = canonical_rows(s_cols, s_rows)
    d_canon = canonical_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:5]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
