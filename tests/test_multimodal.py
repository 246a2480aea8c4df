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


# --------------------------------------------------------------------------
# r12: REAL decode kernels — byte-exact goldens on hand-written blobs
# --------------------------------------------------------------------------

def _hand_ppm():
    # 2x1 image, pixels (1,2,3) (4,5,6); a header comment exercises the
    # spec's comment rule
    return b"P6\n# hand-made\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])


def _hand_bmp(top_down=False):
    # 3x2 24-bit BI_RGB; pixels in IMAGE order (row 0 = top):
    #   (10,20,30) (40,50,60) (70,80,90)
    #   (11,21,31) (41,51,61) (71,81,91)
    import struct

    w, h = 3, 2
    rows = [
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
        [(11, 21, 31), (41, 51, 61), (71, 81, 91)],
    ]
    order = rows if top_down else rows[::-1]  # bottom-up storage
    body = b""
    for row in order:
        line = b"".join(bytes((b, g, r)) for r, g, b in row)  # BGR
        body += line + b"\x00" * (((w * 3 + 3) // 4) * 4 - w * 3)
    return (
        struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
            len(body), 2835, 2835, 0, 0,
        )
        + body
    )


_BMP_SUMS = dict(
    sum_r=10 + 40 + 70 + 11 + 41 + 71,
    sum_g=20 + 50 + 80 + 21 + 51 + 81,
    sum_b=30 + 60 + 90 + 31 + 61 + 91,
)


def _hand_wav():
    # PCM16 mono 44.1k, samples [1000, -1000, 32767, -32768]; a LIST
    # chunk BEFORE data exercises the chunk walk
    import struct

    data = struct.pack("<4h", 1000, -1000, 32767, -32768)
    list_chunk = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(list_chunk) + len(data), b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 44100, 88200, 2, 16)
        + list_chunk
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def test_real_ppm_decode_is_byte_exact():
    from data_ingestion_backend_spark.operators.multimodal import _decode_ppm

    got = _decode_ppm(_hand_ppm())
    assert got == {
        "kind": "ppm", "width": 2, "height": 1,
        "sum_r": 1 + 4, "sum_g": 2 + 5, "sum_b": 3 + 6,
    }


def test_real_bmp_decode_handles_bottom_up_bgr_and_padding():
    from data_ingestion_backend_spark.operators.multimodal import _decode_bmp

    for td in (False, True):  # bottom-up AND top-down (negative height)
        got = _decode_bmp(_hand_bmp(top_down=td))
        assert got == {"kind": "bmp", "width": 3, "height": 2, **_BMP_SUMS}, td


def test_real_wav_decode_walks_chunks_and_signs_samples():
    from data_ingestion_backend_spark.operators.multimodal import _decode_wav

    got = _decode_wav(_hand_wav())
    assert got == {
        "kind": "wav", "sample_rate": 44100, "n_samples": 4,
        "sum_abs": 1000 + 1000 + 32767 + 32768,
    }


def test_real_decode_rejects_corrupt_loudly():
    import pytest

    from data_ingestion_backend_spark.operators.multimodal import (
        decode_media_bytes,
    )

    for blob, msg in (
        (b"GARBAGE!", "unknown media magic"),
        (b"P6\n2 1\n255\n\x01\x02", "truncated PPM pixel"),
        (b"BM" + b"\x00" * 10, "truncated BMP header"),
        (b"RIFF\x10\x00\x00\x00WAVEjunk", "missing fmt/data"),
    ):
        with pytest.raises(ValueError, match=msg):
            decode_media_bytes(blob)


def test_decode_media_real_stage_quarantines_corrupt_rows(spark):
    """The Arrow stage: real rows decode, the corrupt row surfaces as an
    err column instead of failing the pass."""
    from data_ingestion_backend_spark.operators.multimodal import (
        decode_media_real,
    )

    df = spark.createDataFrame(
        [
            (1, bytearray(_hand_ppm())),
            (2, bytearray(_hand_bmp())),
            (3, bytearray(_hand_wav())),
            (4, bytearray(b"NOTMEDIA")),
        ],
        "media_id long, media binary",
    )
    rows = {r["media_id"]: r.asDict() for r in decode_media_real(df).collect()}
    assert rows[1]["kind"] == "ppm" and rows[1]["sum_r"] == 5
    assert rows[2]["kind"] == "bmp" and rows[2]["sum_b"] == _BMP_SUMS["sum_b"]
    assert rows[3]["kind"] == "wav" and rows[3]["n_samples"] == 4
    assert rows[4]["kind"] is None and "unknown media magic" in rows[4]["err"]
    assert rows[1]["err"] is None


def test_media_decode_query_matches_duckdb_oracle(spark):
    """The registered differential, run locally: the real decoders over
    md5-derived PPM/BMP/WAV blobs vs DuckDB recomputing every statistic
    from the hex digest (also the driver's oracle gate for
    `media_decode`)."""
    import duckdb

    from data_ingestion_backend_spark.operators.multimodal import (
        _media_decode_oracle,
        media_decode_fixture,
    )

    got = [
        tuple(r)
        for r in media_decode_fixture(spark, SF_DIR_SMALL).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR_SMALL}/documents.parquet'"
    )
    want = con.execute(_media_decode_oracle()).fetchall()
    assert got == [tuple(r) for r in want]


def _png_chunk(t, d):
    import struct
    import zlib

    return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))


def _hand_png(color=2, interlace=0, filters=(0, 1, 2, 3, 4), corrupt_len=False):
    """2x5 PNG, one scanline per filter type, encoded with an
    independent in-test filter implementation (spec arithmetic written
    out directly, NOT the fixture writer's helper)."""
    import struct
    import zlib

    w, h = 2, len(filters)
    bpp = 3 if color == 2 else 4
    # deterministic pixels: channel c of pixel (row, x) = 7*row+13*x+c+1
    def px(row, x, c):
        return (7 * row + 13 * x + c + 1) & 0xFF

    raw = b""
    prev = [0] * (w * bpp)
    for row, ft in enumerate(filters):
        line = [px(row, x, c) for x in range(w) for c in range(bpp)]
        out = []
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            cc = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc2 = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc2 else (b if pb <= pc2 else cc)
            out.append((line[i] - pred) & 0xFF)
        raw += bytes([ft]) + bytes(out)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, interlace)
    body = zlib.compress(raw)
    if corrupt_len:
        body = body[:-3]
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", body)
        + _png_chunk(b"IEND", b"")
    )


def test_real_png_decode_unfilters_all_five_types():
    from data_ingestion_backend_spark.operators.multimodal import _decode_png

    for color, bpp in ((2, 3), (6, 4)):  # RGB and RGBA
        got = _decode_png(_hand_png(color=color))
        want = {
            c: sum(
                (7 * row + 13 * x + ci + 1) & 0xFF
                for row in range(5)
                for x in range(2)
            )
            for ci, c in enumerate(("sum_r", "sum_g", "sum_b"))
        }
        assert got == {
            "kind": "png", "width": 2, "height": 5, **want
        }, color  # alpha (bpp=4) ignored by the sums


def test_real_png_decode_rejects_unsupported_into_quarantine():
    import pytest

    from data_ingestion_backend_spark.operators.multimodal import _decode_png

    with pytest.raises(ValueError, match="interlaced"):
        _decode_png(_hand_png(interlace=1))
    with pytest.raises(ValueError, match="deflate"):
        _decode_png(_hand_png(corrupt_len=True))
    # palette color type refused (codec-free kernel scope)
    import struct

    bad = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _png_chunk(b"IDAT", b"x")
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="RGB/RGBA"):
        _decode_png(bad)
