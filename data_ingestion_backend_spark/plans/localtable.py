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
    """One-Arrow-batch literal DataFrame (see module docstring).

    The Arrow batch is built column-wise with the EXPLICIT declared type
    (``pa.array(col, type=...)``), so a value Arrow cannot represent
    exactly raises and falls back — never a silent pandas coercion (the
    r13 form inferred dtypes via pandas, where a column mixing ints and
    floats coerces to float64 and int64 values > 2^53 lose exactness;
    advisor item, r14).  The pandas route stays as a second fallback for
    types the column-wise builder cannot express, the plain row-pickled
    builder as the universal last resort.
    """
    if not rows:
        return spark.createDataFrame([], schema)
    try:
        from pyspark.sql.types import _parse_datatype_string

        st = (
            _parse_datatype_string(schema)
            if isinstance(schema, str)
            else schema
        )
    except Exception:
        return spark.createDataFrame(rows, schema)
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        a_schema = to_arrow_schema(st)
        tuples = [tuple(r) for r in rows]
        arrays = [
            pa.array([t[i] for t in tuples], type=a_schema.field(i).type)
            for i in range(len(a_schema))
        ]
        tbl = pa.Table.from_arrays(arrays, schema=a_schema)
        # one JVM-readable batch; coalesce(1) keeps the model-sized
        # control-plane table in a single partition (narrow — no job)
        return spark.createDataFrame(tbl, schema=st).coalesce(1)
    except Exception:
        pass
    try:
        import pandas as pd

        pdf = pd.DataFrame.from_records(
            [tuple(r) for r in rows], columns=[f.name for f in st.fields]
        )
        return spark.createDataFrame(pdf, schema=st).coalesce(1)
    except Exception:
        # any pandas/Arrow coercion gap: the plain (slow but universal) path
        return spark.createDataFrame(rows, schema)
