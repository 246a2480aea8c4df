"""Multimodal (image/audio/video) column plumbing (SURVEY §2.10).

Media lives in DataFrames as **opaque ``binary`` columns + typed metadata
structs**; decode / feature-extraction runs as Arrow-batched pandas
functions over ``mapInPandas``.  Codec-FREE formats decode for REAL
(r12): binary PPM, uncompressed 24-bit BMP, and WAV-PCM16 have pure
Python/struct kernels with byte-exact goldens and a cross-engine
differential (`decode_media_real` / `media_decode`).  Only the formats
that genuinely need codec libraries absent from this container
(JPEG/MP3/MP4) remain STUBBED (deterministic fakes clearly marked
below); everything Spark-side — schema, batching, partitioning, UDF
signature — is real and tested for both.

Design for 100 TB of media:
- media rows are *wide* (MBs per row): keep ``spark.sql.files.
  maxPartitionBytes`` at default so a partition holds few rows, and never
  shuffle the binary column — all derived features are computed in a
  map-only stage (``mapInPandas``), then the bytes are dropped before any
  join/agg.
- metadata (dims, codec, duration) travels in a struct column so filters
  on it prune without touching bytes (parquet column pruning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_backend_spark.operators.queries import (
    _register,
    _register_standalone,
)
from data_ingestion_backend_spark.sources.fixtures import load_table

FEATURE_DIM = 8
RESIZE_MAX_SIDE = 32        # aspect-preserving bound for the resize stage
FRAME_STRIDE_MS = 1000      # sample one frame per second of fake video
FAKE_MS_PER_BYTE = 40       # stub duration model: 40 ms of "video" per byte

MEDIA_SCHEMA = (
    "media_id bigint, media binary, "
    "meta struct<kind:string, n_bytes:bigint, content_md5:string>"
)

DECODED_SCHEMA = (
    "media_id bigint, width int, height int, "
    f"feature array<float>"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media table from the documents fixture (text → fake bytes).

    Stands in for ``spark.read.format("binaryFile")`` over an object-store
    prefix; the binary column + metadata struct shape is identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    media = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        media.alias("media"),
        F.struct(
            F.lit("image/fake").alias("kind"),
            F.length(media).cast("bigint").alias("n_bytes"),
            F.md5(media).alias("content_md5"),
        ).alias("meta"),
    )


def _decode_stub(media: bytes) -> tuple[int, int, list[float]]:
    """STUB decode kernel — deterministic fake in place of a real codec.

    A real deployment replaces this one function with e.g. PIL/librosa/
    pyav decoding; the Spark plumbing around it is unchanged.  The fake
    derives (width, height, feature[8]) from the md5 digest so results
    are stable across runs/partitionings and testable.
    """
    digest = hashlib.md5(media).digest()
    width = 1 + digest[0] % 64
    height = 1 + digest[1] % 64
    feature = [b / 255.0 for b in digest[2 : 2 + FEATURE_DIM]]
    return width, height, feature


def decode_media(media_df: DataFrame, batch_hint: int = 64) -> DataFrame:
    """Decode/feature-extract media rows via Arrow-batched mapInPandas.

    Map-only stage: no shuffle touches the binary column; output drops the
    bytes and carries only fixed-size features, so everything downstream
    (joins, ANN, dedup) is cheap.  ``batch_hint`` caps Arrow batch memory
    for wide rows (set ``spark.sql.execution.arrow.maxRecordsPerBatch``
    accordingly in production).
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "feature": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                w, h, feat = _decode_stub(bytes(blob))
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return media_df.select("media_id", "media").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )


@_register(
    "media_metadata",
    # DuckDB md5() takes VARCHAR only; md5(text) hashes the same utf-8
    # bytes Spark's md5(binary) sees, so the two sides agree.
    """SELECT doc_id AS media_id,
              CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
              md5(text) AS content_md5
       FROM documents ORDER BY media_id""",
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection of the media table (bytes never shuffled).

    Certifies the binary-column handling the oracle *can* see: byte
    length and content hash over the binary payload.
    """
    return (
        media_table(spark, sf_dir)
        .select(
            "media_id",
            F.col("meta.n_bytes").alias("n_bytes"),
            F.col("meta.content_md5").alias("content_md5"),
        )
        .orderBy("media_id")
    )


def _media_features_oracle() -> str:
    # The stub decoder is pure md5 arithmetic, so the WHOLE Arrow-batched
    # mapInPandas stage gets a differential oracle: digest byte k = hex
    # chars (2k+1, 2k+2); width/height from bytes 0-1, features from bytes
    # 2-9.  CAST AS FLOAT matches the float32 rounding of the Spark-side
    # `array<float>` schema bit-for-bit.  The feature vector is FLATTENED
    # to (media_id, pos, feat) rows on both sides: an array terminal
    # column crashes the driver's pandas canonicalizer (ndarray cells are
    # unhashable under sort_values), while the long form hashes cleanly.
    def byte(k: int) -> str:
        return f"CAST(('0x' || substr(md5(text), {2 * k + 1}, 2)) AS INT)"

    feats = ", ".join(
        f"CAST({byte(2 + i)} / 255.0 AS FLOAT)" for i in range(FEATURE_DIM)
    )
    return f"""SELECT doc_id AS media_id,
              CAST(1 + {byte(0)} % 64 AS INT) AS width,
              CAST(1 + {byte(1)} % 64 AS INT) AS height,
              CAST(i - 1 AS BIGINT) AS pos,
              [{feats}][i] AS feat
       FROM documents, (SELECT unnest(range(1, {FEATURE_DIM + 1})) AS i)
       ORDER BY media_id, pos"""


# --------------------------------------------------------------------------
# Resize — Arrow-batched, aspect-preserving downscale (stub resampler)
# --------------------------------------------------------------------------

RESIZED_SCHEMA = (
    "media_id bigint, width int, height int, r_width int, r_height int, "
    "r_md5 string"
)


def resize_media(media_df: DataFrame, max_side: int = RESIZE_MAX_SIDE) -> DataFrame:
    """Aspect-preserving downscale to ``max_side`` via mapInPandas.

    The resample kernel is STUBBED (no codecs in this container): target
    dims are exact integer arithmetic on the decoded dims (floor scale,
    never upscale, min 1 px), and the "resampled bytes" are replaced by a
    deterministic content fingerprint ``md5(media || ':WxH')`` so the
    whole stage — batching, per-row kernel call, output schema — has a
    cross-engine oracle.  A real deployment swaps the two marked lines
    for PIL's ``thumbnail``; the Spark plumbing is unchanged.

    Map-only (no shuffle ever touches the bytes); at 100 TB this is the
    same narrow pass as decode, and the resized artifact is written
    alongside the original, partitioned identically.
    """

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "width": [], "height": [],
                "r_width": [], "r_height": [], "r_md5": [],
            }
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                blob = bytes(blob)
                w, h, _ = _decode_stub(blob)
                side = max(w, h)
                if side <= max_side:
                    rw, rh = w, h
                else:
                    rw = max(1, (w * max_side) // side)
                    rh = max(1, (h * max_side) // side)
                # STUB resample: fingerprint instead of real pixel data
                r_md5 = hashlib.md5(blob + f":{rw}x{rh}".encode()).hexdigest()
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["r_width"].append(rw)
                out["r_height"].append(rh)
                out["r_md5"].append(r_md5)
            yield pd.DataFrame(out)

    return media_df.select("media_id", "media").mapInPandas(
        resize_batches, schema=RESIZED_SCHEMA
    )


def _media_resize_oracle() -> str:
    # Same differential trick as media_features: the stub kernel is pure
    # md5/integer arithmetic, so DuckDB recomputes the whole Arrow stage.
    def byte(k: int) -> str:
        return f"CAST(('0x' || substr(md5(text), {2 * k + 1}, 2)) AS INT)"

    return f"""WITH dims AS (
         SELECT doc_id AS media_id, text,
                CAST(1 + {byte(0)} % 64 AS INT) AS width,
                CAST(1 + {byte(1)} % 64 AS INT) AS height
         FROM documents
       ),
       scaled AS (
         SELECT media_id, text, width, height,
                CASE WHEN greatest(width, height) <= {RESIZE_MAX_SIDE}
                     THEN width
                     ELSE greatest(1, (width * {RESIZE_MAX_SIDE})
                                      // greatest(width, height)) END AS r_width,
                CASE WHEN greatest(width, height) <= {RESIZE_MAX_SIDE}
                     THEN height
                     ELSE greatest(1, (height * {RESIZE_MAX_SIDE})
                                      // greatest(width, height)) END AS r_height
         FROM dims
       )
       SELECT media_id, width, height,
              CAST(r_width AS INT) AS r_width, CAST(r_height AS INT) AS r_height,
              md5(text || ':' || r_width || 'x' || r_height) AS r_md5
       FROM scaled ORDER BY media_id"""


@_register_standalone("media_resize", _media_resize_oracle())
def media_resize_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage over the fixture media table (standalone oracle —
    the graded media certs already cover the family's driver rows)."""
    return resize_media(media_table(spark, sf_dir)).orderBy("media_id")


# --------------------------------------------------------------------------
# Frame sampling — Arrow-batched 1→N row expansion (stub video decoder)
# --------------------------------------------------------------------------

FRAMES_SCHEMA = "media_id bigint, frame_idx int, t_ms bigint, frame_md5 string"


def sample_frames(
    media_df: DataFrame, stride_ms: int = FRAME_STRIDE_MS
) -> DataFrame:
    """Sample one frame every ``stride_ms`` from each (fake) video row.

    The batch-shape test for video plumbing: mapInPandas emits a VARIABLE
    number of rows per input row (1→N), which is the part a real frame
    sampler needs from Spark — Arrow handles the fan-out, no explode of
    byte arrays, bytes never shuffle.  The decoder is STUBBED: duration
    is modeled as FAKE_MS_PER_BYTE (40) ms per payload byte and each frame's
    content is the fingerprint ``md5(media || ':' || frame_idx)``; a real
    deployment swaps those two lines for pyav keyframe extraction.

    At 100 TB the sampled-frame table is written partitioned by
    (media_id bucket), so per-video reassembly never shuffles frames.
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "t_ms": [], "frame_md5": []}
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                blob = bytes(blob)
                duration_ms = FAKE_MS_PER_BYTE * len(blob)  # STUB duration
                n_frames = max(1, -(-duration_ms // stride_ms))  # ceil, ≥1
                for k in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(k)
                    out["t_ms"].append(k * stride_ms)
                    out["frame_md5"].append(
                        hashlib.md5(blob + f":{k}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media_df.select("media_id", "media").mapInPandas(
        frame_batches, schema=FRAMES_SCHEMA
    )


_FRAMES_SQL = f"""
WITH v AS (
  SELECT doc_id AS media_id, text,
         {FAKE_MS_PER_BYTE} * octet_length(encode(text)) AS duration_ms
  FROM documents
),
n AS (
  SELECT media_id, text,
         greatest(1, CAST(ceil(duration_ms / {FRAME_STRIDE_MS}.0) AS BIGINT))
           AS n_frames
  FROM v
)
SELECT media_id, CAST(t.k AS INT) AS frame_idx,
       CAST(t.k * {FRAME_STRIDE_MS} AS BIGINT) AS t_ms,
       md5(text || ':' || t.k) AS frame_md5
FROM n, LATERAL (SELECT unnest(range(0, n_frames)) AS k) t
ORDER BY media_id, frame_idx
"""


@_register_standalone("media_frame_sample", _FRAMES_SQL)
def media_frame_sample_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the fixture media table (standalone oracle)."""
    return sample_frames(media_table(spark, sf_dir)).orderBy(
        "media_id", "frame_idx"
    )


# --------------------------------------------------------------------------
# REAL decode kernels (r12) — codec-free formats, pure Python/struct
# --------------------------------------------------------------------------
# The sandbox has no image/audio codec libraries, which is why the
# _decode_stub family above fakes its kernels (honestly marked).  These
# formats need NO codec — their specs are a header plus raw samples —
# so the decode path stops being a stub for them: binary PPM (P6),
# uncompressed 24-bit BMP (BI_RGB, bottom-up, BGR, 4-byte row padding),
# and WAV PCM16 mono.  Byte-exact goldens decode hand-written blobs
# with known pixels/samples (tests/test_multimodal.py); the registered
# `media_decode` query additionally puts the WHOLE Arrow stage under a
# DuckDB differential, because the fixture blobs' payloads derive from
# md5(text) — SQL recomputes every channel sum without running Python.
# Stub status is hereby RE-SCOPED to the codec formats (JPEG/MP3/MP4).

WAV_RATE = 8000
_PPM_DIMS = (4, 2)   # fixture image dims (w, h)
_BMP_DIMS = (3, 2)   # w=3 forces a 3-byte row pad — the format's trap
_WAV_SAMPLES = 8
_PNG_DIMS = (4, 5)   # h=5: the fixture writes one scanline per filter type

DECODE_SCHEMA = (
    "media_id bigint, kind string, width int, height int, "
    "sample_rate int, n_samples bigint, "
    "sum_r bigint, sum_g bigint, sum_b bigint, sum_abs bigint, err string"
)


def _decode_ppm(blob: bytes) -> dict:
    """Binary PPM (P6): ASCII header ``P6 <w> <h> <maxval>`` (whitespace/
    comment separated), then ``w*h*3`` raw RGB bytes."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header tokens: ignore comments (# to end-of-line), split on any
    # whitespace; pixel data starts one byte after the maxval token
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(blob):
            raise ValueError("truncated PPM header")
        c = blob[pos : pos + 1]
        if c == b"#":
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            tok = b""
            while pos < len(blob) and not blob[pos : pos + 1].isspace():
                tok += blob[pos : pos + 1]
                pos += 1
            fields.append(int(tok))
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported, maxval={maxval}")
    pix = blob[pos + 1 : pos + 1 + w * h * 3]
    if len(pix) != w * h * 3:
        raise ValueError("truncated PPM pixel data")
    return {
        "kind": "ppm",
        "width": w,
        "height": h,
        "sum_r": sum(pix[0::3]),
        "sum_g": sum(pix[1::3]),
        "sum_b": sum(pix[2::3]),
    }


def _decode_bmp(blob: bytes) -> dict:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB): rows stored
    BOTTOM-UP, channels BGR, each row padded to a 4-byte boundary —
    the three traps a fake decoder never has to get right."""
    import struct

    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    if len(blob) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", blob, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", blob, 26)
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    top_down = h < 0
    h = abs(h)
    row_size = ((w * 3 + 3) // 4) * 4  # 4-byte row alignment
    if len(blob) < data_off + row_size * h:
        raise ValueError("truncated BMP pixel data")
    sum_r = sum_g = sum_b = 0
    for row in range(h):
        src = row if top_down else h - 1 - row  # bottom-up storage
        base = data_off + src * row_size
        line = blob[base : base + w * 3]
        sum_b += sum(line[0::3])  # BGR channel order on disk
        sum_g += sum(line[1::3])
        sum_r += sum(line[2::3])
    return {
        "kind": "bmp",
        "width": w,
        "height": h,
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
    }


def _decode_wav(blob: bytes) -> dict:
    """WAV PCM16: RIFF/WAVE container, ``fmt `` chunk (PCM, mono/stereo,
    16-bit), ``data`` chunk of little-endian signed samples.  Chunks are
    WALKED (not assumed at fixed offsets) — real writers interleave
    LIST/fact chunks before data."""
    import struct

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, _block, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError("only PCM16 WAV supported")
    n = len(data) // 2
    samples = struct.unpack(f"<{n}h", data[: 2 * n])
    return {
        "kind": "wav",
        "sample_rate": rate,
        "n_samples": n // channels,
        "sum_abs": sum(abs(s) for s in samples),
    }


def _png_paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9.4): pick whichever of left/up/
    up-left is closest to a+b-c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _decode_png(blob: bytes) -> dict:
    """PNG with stdlib ``zlib`` alone (r13): walk the chunk stream,
    inflate the concatenated IDAT bodies, and UNFILTER each scanline —
    None/Sub/Up/Average/Paeth, the five per-row predictors real encoders
    mix freely.  8-bit truecolor (RGB) and truecolor+alpha (RGBA) only;
    interlaced images are refused into quarantine (Adam7 needs seven
    sub-images — out of scope for a codec-free kernel), as are palette/
    grayscale depths.  RGBA alpha is ignored by the channel sums (the
    stats contract is color energy, same as the other image kinds)."""
    import struct
    import zlib

    if blob[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, b""
    while pos + 8 <= len(blob):
        ln, ctype = struct.unpack_from(">I4s", blob, pos)
        body = blob[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + ln  # length + type + payload's trailing CRC
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (2, 6) or comp != 0 or filt != 0:
        raise ValueError("only 8-bit RGB/RGBA PNG supported")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    bpp = 3 if color == 2 else 4
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise ValueError(f"bad PNG deflate stream: {e}")
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("bad PNG scanline length")
    prev = bytearray(stride)
    sum_r = sum_g = sum_b = 0
    for row in range(h):
        off = row * (stride + 1)
        ft = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _png_paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        sum_r += sum(line[0::bpp])
        sum_g += sum(line[1::bpp])
        sum_b += sum(line[2::bpp])
        prev = line
    return {
        "kind": "png",
        "width": w,
        "height": h,
        "sum_r": sum_r,
        "sum_g": sum_g,
        "sum_b": sum_b,
    }


_MEDIA_DECODERS = (
    (b"P6", _decode_ppm),
    (b"BM", _decode_bmp),
    (b"RIFF", _decode_wav),
    (b"\x89PNG", _decode_png),
)


def decode_media_bytes(blob: bytes) -> dict:
    """Format-sniffing dispatch over the real decode kernels (magic
    bytes, the binaryFile-ingest convention).  Raises ValueError on an
    unknown or corrupt payload — `decode_media_real` maps that to an
    ``err`` column row so one bad object never kills a 100 TB pass."""
    for magic, dec in _MEDIA_DECODERS:
        if blob[: len(magic)] == magic:
            return dec(blob)
    raise ValueError(f"unknown media magic {blob[:4]!r}")


def decode_media_real(media_df: DataFrame) -> DataFrame:
    """REAL decode/stats over a (media_id, media) frame via the same
    Arrow-batched map-only stage as `decode_media`: bytes never shuffle,
    output is fixed-width scalars.  Corrupt/unknown rows surface as
    (media_id, err) instead of failing the stage — at scale a decode
    pass must quarantine, not crash."""

    cols = (
        "kind width height sample_rate n_samples sum_r sum_g sum_b sum_abs"
    ).split()

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                rec = {c: None for c in cols}
                rec["media_id"] = mid
                try:
                    rec.update(decode_media_bytes(bytes(blob)))
                    rec["err"] = None
                except ValueError as e:
                    rec["err"] = str(e)
                rows.append(rec)
            yield pd.DataFrame(rows, columns=["media_id", *cols, "err"])

    return media_df.select("media_id", "media").mapInPandas(
        decode_batches, schema=DECODE_SCHEMA
    )


def _digest_bytes_expr_sql(k: str) -> str:
    # DuckDB: byte k of md5(text)'s 16-byte digest, from the hex string
    return f"CAST(('0x' || substr(md5(text), 2 * ({k}) + 1, 2)) AS INT)"


def media_blob_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic REAL-format media fixture: each document becomes a
    PPM / BMP / WAV / PNG blob (by ``doc_id % 4``) whose payload bytes
    cycle the md5(text) digest — so a SQL oracle can recompute every
    decoded channel sum from the hex digest without decoding anything.
    The writer intentionally exercises the format traps the decoders
    must survive: BMP rows are emitted bottom-up, BGR, padded; WAV
    samples are signed little-endian; PNG scanlines cycle ALL FIVE
    filter types (row % 5), so the oracle differential covers the
    whole unfilter matrix plus the deflate round-trip."""
    import struct

    import zlib

    def _png_filter_row(line: bytes, prev: bytes, ft: int, bpp: int) -> bytes:
        """Apply PNG filter ``ft`` to one raw scanline (the encoder-side
        inverse of `_decode_png`'s unfilter)."""
        out = bytearray(len(line))
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            pred = (
                0 if ft == 0
                else a if ft == 1
                else b if ft == 2
                else (a + b) >> 1 if ft == 3
                else _png_paeth(a, b, c)
            )
            out[i] = (line[i] - pred) & 0xFF
        return bytes(out)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                digest = hashlib.md5(str(text).encode()).digest()
                kind = did % 4
                if kind == 0:
                    w, h = _PPM_DIMS
                    pix = bytes(digest[i % 16] for i in range(w * h * 3))
                    blob = b"P6\n%d %d\n255\n" % (w, h) + pix
                elif kind == 1:
                    w, h = _BMP_DIMS
                    row_size = ((w * 3 + 3) // 4) * 4
                    # image-order RGB pixel bytes, cycled from the digest
                    pix = [digest[i % 16] for i in range(w * h * 3)]
                    body = b""
                    for row in range(h - 1, -1, -1):  # bottom-up
                        line = b""
                        for x in range(w):
                            r, g, b = pix[(row * w + x) * 3 : (row * w + x) * 3 + 3]
                            line += bytes((b, g, r))  # BGR on disk
                        body += line + b"\x00" * (row_size - w * 3)
                    blob = (
                        struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
                        + struct.pack(
                            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                            2835, 2835, 0, 0,
                        )
                        + body
                    )
                elif kind == 2:
                    data = digest[: 2 * _WAV_SAMPLES]
                    blob = (
                        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
                        + struct.pack(
                            "<4sIHHIIHH", b"fmt ", 16, 1, 1, WAV_RATE,
                            WAV_RATE * 2, 2, 16,
                        )
                        + struct.pack("<4sI", b"data", len(data))
                        + data
                    )
                else:  # PNG: one scanline per filter type (0..4)
                    w, h = _PNG_DIMS
                    pix = bytes(digest[i % 16] for i in range(w * h * 3))
                    raw, prev = b"", bytes(w * 3)
                    for row in range(h):
                        line = pix[row * w * 3 : (row + 1) * w * 3]
                        ft = row % 5
                        raw += bytes([ft]) + _png_filter_row(line, prev, ft, 3)
                        prev = line
                    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

                    def _chunk(t: bytes, d: bytes) -> bytes:
                        return (
                            struct.pack(">I", len(d))
                            + t
                            + d
                            + struct.pack(">I", zlib.crc32(t + d))
                        )

                    blob = (
                        b"\x89PNG\r\n\x1a\n"
                        + _chunk(b"IHDR", ihdr)
                        + _chunk(b"IDAT", zlib.compress(raw))
                        + _chunk(b"IEND", b"")
                    )
                ids.append(did)
                blobs.append(blob)
            yield pd.DataFrame({"media_id": ids, "media": blobs})

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(gen, schema="media_id bigint, media binary")


def _media_decode_oracle() -> str:
    # The blobs' payloads are md5(text) digest bytes cycled, so DuckDB
    # recomputes every decoded statistic from the HEX DIGEST — the
    # differential covers header writing AND header parsing end-to-end
    # (a byte-order or padding bug on either side breaks a sum).
    b = _digest_bytes_expr_sql
    pw, ph = _PPM_DIMS
    bw, bh = _BMP_DIMS
    gw, gh = _PNG_DIMS
    ppm_n, bmp_n, png_n = pw * ph * 3, bw * bh * 3, gw * gh * 3
    return f"""WITH img AS (
         SELECT doc_id AS media_id, text, doc_id % 4 AS k FROM documents
       ),
       px AS (  -- pixel byte i of the cycled digest, per image kind
         SELECT media_id, k, i.i AS i, {b("i.i % 16")} AS v
         FROM img, (SELECT unnest(range({max(ppm_n, bmp_n, png_n)})) AS i) i
         WHERE (k = 0 AND i.i < {ppm_n}) OR (k = 1 AND i.i < {bmp_n})
            OR (k = 3 AND i.i < {png_n})
       ),
       sums AS (
         SELECT media_id,
                CAST(sum(CASE WHEN i % 3 = 0 THEN v END) AS BIGINT) AS sum_r,
                CAST(sum(CASE WHEN i % 3 = 1 THEN v END) AS BIGINT) AS sum_g,
                CAST(sum(CASE WHEN i % 3 = 2 THEN v END) AS BIGINT) AS sum_b
         FROM px GROUP BY media_id
       ),
       wav AS (
         SELECT media_id,
                CAST(sum(abs(CASE WHEN raw >= 32768 THEN raw - 65536
                                  ELSE raw END)) AS BIGINT) AS sum_abs
         FROM (
           SELECT media_id,
                  {b("2 * s.s")} + 256 * {b("2 * s.s + 1")} AS raw
           FROM img, (SELECT unnest(range({_WAV_SAMPLES})) AS s) s
           WHERE k = 2
         ) GROUP BY media_id
       )
       SELECT i.media_id,
              CASE i.k WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp'
                       WHEN 2 THEN 'wav' ELSE 'png' END AS kind,
              CASE i.k WHEN 0 THEN {pw} WHEN 1 THEN {bw}
                       WHEN 3 THEN {gw} END AS width,
              CASE i.k WHEN 0 THEN {ph} WHEN 1 THEN {bh}
                       WHEN 3 THEN {gh} END AS height,
              CASE i.k WHEN 2 THEN {WAV_RATE} END AS sample_rate,
              CASE i.k WHEN 2 THEN CAST({_WAV_SAMPLES} AS BIGINT) END AS n_samples,
              s.sum_r, s.sum_g, s.sum_b, w.sum_abs,
              CAST(NULL AS VARCHAR) AS err
       FROM img i LEFT JOIN sums s USING (media_id)
       LEFT JOIN wav w USING (media_id)
       ORDER BY media_id"""


@_register_standalone("media_decode", _media_decode_oracle())
def media_decode_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode over real-format blobs (PPM/BMP/WAV built from the
    documents fixture): the full Arrow stage — header writing, sniffing
    dispatch, header parsing, bottom-up/BGR/padded BMP rows, signed
    PCM16 — under a cross-engine differential that recomputes every
    channel/sample statistic from the md5 digest in SQL."""
    return decode_media_real(media_blob_table(spark, sf_dir)).orderBy(
        "media_id"
    )


@_register("media_features", _media_features_oracle())
def media_features_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decoded features over the fixture media table, long form.

    This certifies the *pandas decode stage itself* against SQL: the stub
    kernel is deterministic md5 arithmetic, so DuckDB recomputes the same
    width/height/feature values without ever running Python — schema,
    Arrow batching, float32 rounding, and row coverage all gated.  The
    pipeline-facing operator is ``decode_media`` (array column, for ANN /
    dedup consumers); this registered cert flattens via posexplode so the
    terminal schema is canon-safe (scalar columns only).
    """
    return (
        decode_media(media_table(spark, sf_dir))
        .select(
            "media_id",
            "width",
            "height",
            F.posexplode("feature").alias("pos", "feat"),
        )
        .withColumn("pos", F.col("pos").cast("bigint"))
        .orderBy("media_id", "pos")
    )
