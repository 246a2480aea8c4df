"""Multimodal plumbing tests: binary columns, Arrow batch decode, determinism."""

from __future__ import annotations

from pyspark.sql import types as T

from data_ingestion_backend_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    media_table,
)
from tests.conftest import SF_DIR_SMALL


def test_media_table_schema(spark):
    df = media_table(spark, SF_DIR_SMALL)
    assert isinstance(df.schema["media"].dataType, T.BinaryType)
    meta = df.schema["meta"].dataType
    assert isinstance(meta, T.StructType)
    assert [f.name for f in meta.fields] == ["kind", "n_bytes", "content_md5"]
    row = df.first()
    assert row["meta"]["n_bytes"] == len(row["media"])


def test_decode_shapes_and_determinism(spark):
    media = media_table(spark, SF_DIR_SMALL)
    decoded = decode_media(media)
    rows = decoded.collect()
    assert len(rows) == media.count()
    for r in rows[:10]:
        assert 1 <= r["width"] <= 64 and 1 <= r["height"] <= 64
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r["feature"])

    # repartitioning must not change any decoded value (batch-shape safety)
    again = {
        r["media_id"]: (r["width"], r["height"], tuple(r["feature"]))
        for r in decode_media(media.repartition(13)).collect()
    }
    for r in rows:
        assert again[r["media_id"]] == (
            r["width"],
            r["height"],
            tuple(r["feature"]),
        )
