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


def test_resize_bounds_and_aspect(spark):
    from data_ingestion_backend_spark.operators.multimodal import (
        RESIZE_MAX_SIDE,
        media_resize_fixture,
    )

    rows = media_resize_fixture(spark, SF_DIR_SMALL).collect()
    assert rows
    for r in rows:
        assert 1 <= r["r_width"] <= RESIZE_MAX_SIDE
        assert 1 <= r["r_height"] <= RESIZE_MAX_SIDE
        # never upscale; aspect ordering preserved
        assert r["r_width"] <= r["width"] and r["r_height"] <= r["height"]
        if r["width"] > r["height"]:
            assert r["r_width"] >= r["r_height"]
        elif r["width"] < r["height"]:
            assert r["r_width"] <= r["r_height"]
        if max(r["width"], r["height"]) <= RESIZE_MAX_SIDE:
            assert (r["r_width"], r["r_height"]) == (r["width"], r["height"])


def test_frame_sample_fanout_and_determinism(spark):
    from data_ingestion_backend_spark.operators.multimodal import (
        FAKE_MS_PER_BYTE,
        FRAME_STRIDE_MS,
        media_frame_sample_fixture,
        media_table,
    )

    media = media_table(spark, SF_DIR_SMALL)
    n_bytes = {r["media_id"]: r["meta"]["n_bytes"] for r in media.collect()}
    frames: dict[int, list] = {}
    for r in media_frame_sample_fixture(spark, SF_DIR_SMALL).collect():
        frames.setdefault(r["media_id"], []).append(r)
    assert set(frames) == set(n_bytes)  # every video sampled, even empty ones
    for mid, rows in frames.items():
        rows.sort(key=lambda r: r["frame_idx"])
        expected = max(1, -(-FAKE_MS_PER_BYTE * n_bytes[mid] // FRAME_STRIDE_MS))
        assert len(rows) == expected
        assert [r["frame_idx"] for r in rows] == list(range(expected))
        assert all(r["t_ms"] == r["frame_idx"] * FRAME_STRIDE_MS for r in rows)
        assert len({r["frame_md5"] for r in rows}) == expected  # distinct frames
