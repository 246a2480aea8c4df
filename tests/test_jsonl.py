"""JSONL source/sink contract (sources/jsonl.py): round-trip fidelity,
quarantine-not-poison on malformed lines, and schema-drift tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from conftest import SF_DIR_SMALL
from data_ingestion_backend_spark.sources.fixtures import load_table
from data_ingestion_backend_spark.sources.jsonl import (
    CORRUPT_COL,
    read_jsonl,
    write_jsonl,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def test_jsonl_roundtrip_documents(spark, tmp_path):
    """write → read reproduces the documents table exactly, including a
    planted multi-line text (newlines JSON-escape; the one-record-per-
    line invariant survives)."""
    docs = load_table(spark, SF_DIR_SMALL, "documents")
    planted = spark.createDataFrame(
        [(999_999, 'line1\nline2\t"quoted"', "en", "synthetic", 20)],
        DOC_SCHEMA,
    )
    original = docs.unionByName(planted)
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(original, path)
    good, bad = read_jsonl(spark, path, DOC_SCHEMA)
    assert bad.count() == 0
    a = sorted(tuple(r) for r in original.collect())
    b = sorted(tuple(r) for r in good.collect())
    assert a == b


def test_jsonl_quarantines_malformed_lines(spark, tmp_path):
    """One bad line must neither fail the read nor disappear: good rows
    parse, the corrupt raw line lands in quarantine, blank lines are not
    records."""
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "{this is not json at all\n"
        "\n"
        '{"doc_id": 2, "text": "also ok", "lang": "de", "source": "s", "n_chars": 7}\n'
    )
    good, bad = read_jsonl(spark, str(p), DOC_SCHEMA)
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    quarantined = bad.collect()
    assert len(quarantined) == 1
    assert quarantined[0][CORRUPT_COL].startswith("{this is not json")


def test_jsonl_schema_drift_tolerated(spark, tmp_path):
    """Missing fields parse to null; unknown extra fields are ignored —
    the schema is a contract, not a cage."""
    p = tmp_path / "drift.jsonl"
    p.write_text(
        '{"doc_id": 10, "text": "no lang field", "source": "s", "n_chars": 13}\n'
        '{"doc_id": 11, "text": "extra", "lang": "en", "source": "s",'
        ' "n_chars": 5, "unexpected": [1, 2]}\n'
    )
    good, bad = read_jsonl(spark, str(p), DOC_SCHEMA)
    assert bad.count() == 0
    rows = {r["doc_id"]: r for r in good.collect()}
    assert rows[10]["lang"] is None
    assert rows[11]["text"] == "extra"
    assert good.columns == [f.name for f in DOC_SCHEMA.fields]


def test_jsonl_single_pass_plan(spark, tmp_path):
    """good and quarantine must share ONE text scan in the plan (the
    corpus is read once, not once per verdict)."""
    p = tmp_path / "one.jsonl"
    p.write_text('{"doc_id": 1, "text": "x", "lang": "e", "source": "s", "n_chars": 1}\n')
    good, bad = read_jsonl(spark, str(p), DOC_SCHEMA)
    for df in (good, bad):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("FileScan text") == 1
