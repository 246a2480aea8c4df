"""Literal control-plane tables without per-task Python workers (r13).

``spark.createDataFrame(list_of_rows)`` plans a pickled-RDD scan with
``defaultParallelism`` slices: executing it (every broadcast build of a
model table — codebooks, centroids, ADC distance tables, stopword
lexicons, DSIR histograms) runs 32 tasks that each round-trip a Python
worker to deserialize a handful of rows — measured ~5 s of task time per
build (~0.3–0.5 s wall) for tables of a few hundred rows.

:func:`local_df` routes the same rows through pandas + Arrow instead:
the driver converts ONCE to a single Arrow batch that the JVM reads
directly — one JVM-only partition, no Python tasks, no 32-slice
parallelize.  Values are unchanged (Arrow carries int64/float64/strings
/list<double> exactly); a conversion the Arrow path cannot express falls
back to the plain builder.  Keep using plain ``createDataFrame`` (or the
``spark.range(1).select(lit…)`` form) from streaming micro-batch threads
— see ``pipeline._ledger_row`` — this helper is for batch query paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def local_df(spark: SparkSession, rows, schema: str | StructType) -> DataFrame:
    """One-Arrow-batch literal DataFrame (see module docstring)."""
    if not rows:
        return spark.createDataFrame([], schema)
    try:
        import pandas as pd
        from pyspark.sql.types import _parse_datatype_string

        st = (
            _parse_datatype_string(schema)
            if isinstance(schema, str)
            else schema
        )
        pdf = pd.DataFrame.from_records(
            [tuple(r) for r in rows], columns=[f.name for f in st.fields]
        )
        # the Arrow path still chunks by defaultParallelism; these are
        # model-sized control-plane tables, so one JVM partition is the
        # right execution shape (coalesce is narrow — no extra job)
        return spark.createDataFrame(pdf, schema=st).coalesce(1)
    except Exception:
        # any pandas/Arrow coercion gap: the plain (slow but universal) path
        return spark.createDataFrame(rows, schema)
