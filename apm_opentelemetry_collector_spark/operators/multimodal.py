"""Multimodal columns — opaque binary payloads with typed metadata.

A 100 TB training-data pipeline carries images/audio/video next to text.
The Spark-side contract this module implements:

  - payloads are opaque `binary` columns; NEVER decoded row-at-a-time in
    the JVM — decode/feature-extraction runs in Arrow-batched Python
    (`mapInPandas`) where the imaging/audio libraries live;
  - typed metadata travels as a struct column `media_meta {modality,
    mime, width, height, duration_ms, n_bytes}` so partition pruning,
    filtering and statistics work WITHOUT touching payload bytes;
  - batch shape: mapInPandas receives/yields pandas DataFrames whose
    binary cells are Python bytes — the UDF controls batch size via
    spark.sql.execution.arrow.maxRecordsPerBatch, not per-row calls.

The actual decoders (PIL/librosa/ffmpeg) are NOT in this container, so
`decode_image` raises NotImplementedError by design, and
`fake_decode_image` provides a deterministic stand-in (parses the tiny
header format the synthesizer writes) so the plumbing — schema,
partitioning, UDF signature, batch shape — is fully testable. Swapping
in a real decoder changes ONE function body, nothing in the plan.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

# synthetic payload format: b"IMG0" + u16 width + u16 height + pixel bytes
FAKE_MAGIC = b"IMG0"


def synth_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic fake image payload + metadata per row.

    Payload bytes are a pure function of the id (JVM-side expressions;
    no Python): header + repeated md5 bytes as 'pixels'.
    """
    w = (F.col(id_col) % 64 + 8).cast("int")
    h = (F.col(id_col) % 48 + 8).cast("int")
    header = F.concat(
        F.lit(FAKE_MAGIC),
        # big-endian u16 via 4-hex-char unhex
        F.unhex(F.lpad(F.hex(w), 4, "0")),
        F.unhex(F.lpad(F.hex(h), 4, "0")),
    )
    pixels = F.unhex(F.repeat(F.md5(F.col(id_col).cast("string").cast("binary")), 4))
    payload = F.concat(header, pixels)
    meta = F.struct(
        F.lit("image").alias("modality"),
        F.lit("image/x-fake").alias("mime"),
        w.alias("width"),
        h.alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
    )
    return df.withColumn("media", payload).withColumn("media_meta", meta)


def decode_image(data: bytes):
    """Real decoder hook — imaging libraries absent in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv; not available in this "
        "environment — use fake_decode_image for the plumbing path"
    )


def fake_decode_image(data: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in decoder: parse the synthetic header →
    (width, height, checksum-of-pixels)."""
    if data[:4] != FAKE_MAGIC:
        raise ValueError("bad media magic")
    w, h = struct.unpack(">HH", data[4:8])
    checksum = sum(data[8:]) % 65536
    return w, h, checksum


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixel_checksum", T.IntegerType()),
        T.StructField("batch_rows", T.IntegerType()),
    ]
)


def extract_features(media_df: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature pass (mapInPandas).

    batch_rows records how many rows each Arrow batch carried — the
    tests assert batching actually happens (no per-row calls).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf["doc_id"], pdf["media"]):
                w, h, checksum = fake_decode_image(bytes(data))
                rows.append((int(doc_id), w, h, checksum, len(pdf)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "pixel_checksum", "batch_rows"]
            )

    return media_df.select("doc_id", "media").mapInPandas(run, FEATURES_SCHEMA)


# synthetic video format: b"VID0" + u16 n_frames + u16 frame_len + frames
FAKE_VIDEO_MAGIC = b"VID0"
FRAME_LEN = 32  # each fake frame = md5('<id>:<frame>') bytes repeated 2×
N_FRAME_SAMPLES = 3


def synth_video(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic fake video payload + metadata per row.

    n_frames = id % 12 + 4; frame f's bytes are md5('<id>:<f>') repeated
    2×. Entirely JVM-side expressions (the variable-length frame concat
    is an aggregate over a transformed sequence) — a pure function of
    the id, so the frame-sampling oracle can recompute any frame's
    checksum in SQL without touching bytes.
    """
    sid = F.col(id_col).cast("string")
    n_frames = (F.col(id_col) % 12 + 4).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda f: F.unhex(
            F.repeat(F.md5(F.concat(sid, F.lit(":"), f.cast("string")).cast("binary")), 2)
        ),
    )
    payload = F.concat(
        F.lit(FAKE_VIDEO_MAGIC),
        F.unhex(F.lpad(F.hex(n_frames), 4, "0")),
        F.unhex(F.lpad(F.hex(F.lit(FRAME_LEN)), 4, "0")),
        F.aggregate(frames, F.lit(b""), lambda acc, x: F.concat(acc, x)),
    )
    meta = F.struct(
        F.lit("video").alias("modality"),
        F.lit("video/x-fake").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (n_frames * 40).alias("duration_ms"),  # fake 25 fps
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
    )
    return df.withColumn("media", payload).withColumn("media_meta", meta)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_checksum", T.IntegerType()),
    ]
)


def sample_frames(media_df: DataFrame, n_samples: int = N_FRAME_SAMPLES) -> DataFrame:
    """Uniform-stride frame sampling: frame_idx_j = ⌊j·n_frames/n⌋ for
    j in 0..n−1 — the deterministic pick a video-pretraining pipeline
    uses (real decoders swap into the same Arrow-batched pass). One
    output row per sampled frame; payload bytes are parsed in Python
    per Arrow BATCH, never per-row JVM calls.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(data)
                if b[:4] != FAKE_VIDEO_MAGIC:
                    raise ValueError("bad video magic")
                n_frames, flen = struct.unpack(">HH", b[4:8])
                for j in range(n_samples):
                    idx = j * n_frames // n_samples
                    frame = b[8 + idx * flen : 8 + (idx + 1) * flen]
                    rows.append(
                        (int(doc_id), idx, n_frames, sum(frame) % 65536)
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "n_frames", "frame_checksum"]
            )

    return media_df.select("doc_id", "media").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def resize_stub(media_df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize is a payload→payload mapInPandas of the same shape; without
    an imaging library it only rewrites the header dims (documented stub
    — the plan, schema and batching are the real deliverable)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for data in pdf["media"]:
                b = bytes(data)
                if b[:4] != FAKE_MAGIC:
                    raise ValueError("bad media magic")
                out.append(FAKE_MAGIC + struct.pack(">HH", target_w, target_h) + b[8:])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": out})

    return media_df.select("doc_id", "media").mapInPandas(
        run, "doc_id long, media binary"
    )
