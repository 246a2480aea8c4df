"""Multimodal (image/audio/video) column plumbing (SURVEY §2.10).

Media lives in DataFrames as **opaque ``binary`` columns + typed metadata
structs**; decode / feature-extraction runs as Arrow-batched pandas
functions over ``mapInPandas``.  The container has no image/audio codecs,
so the decode kernel is STUBBED (deterministic fake clearly marked below);
everything Spark-side — schema, batching, partitioning, UDF signature —
is real and tested.

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
