"""Record encoding — the sink-side byte format (P5/P6, A4).

Reference (exporter/omnishard/shard_encoder.go): a flushed record's bytes
are `magic[8] ++ gzip(proto(SpanList))` (magic shard_encoder.go:35, gzip
framing :308-322, record assembly :209-214); per-record stats are
spanCount and uncompressedBytes; the compress-factor metric is the
integer division uncompressed/compressed (hooks.go:120-126).

This engine is NOT a byte-parity port (different serialization), but the
same framing — 8-byte magic prefix, gzip body, per-record stats — is
kept so the decode oracle exercises the identical shape the reference's
e2e test uses (exporter_test.go:200-228: validate magic, gunzip, decode,
count spans).

Spark-first placement: encoding runs ONLY at the sink-record boundary,
after packing has assigned (sink, shard, batch_no) — one Arrow batch in,
one encoded record row out per group, via applyInPandas. The payload
serialization is newline-joined turn lines (deterministic order), i.e. a
log-shipping record; gzip level is pinned (mtime=0) so records are
byte-reproducible run to run — something the reference cannot offer
(arrival-order batching).
"""

from __future__ import annotations

import gzip
import io

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..config import RECORD_MAGIC

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("sink", T.StringType()),
        T.StructField("shard_id", T.StringType()),
        T.StructField("batch_no", T.LongType()),
        T.StructField("partition_key", T.StringType()),
        T.StructField("span_count", T.LongType()),
        T.StructField("uncompressed_bytes", T.LongType()),
        T.StructField("compressed_bytes", T.LongType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["conv_id", "turn_idx"])
    lines = (
        pdf["conv_id"].astype(str)
        + "\t"
        + pdf["turn_idx"].astype(str)
        + "\t"
        + pdf["text"].astype(str)
    )
    payload = "\n".join(lines).encode("utf-8")
    buf = io.BytesIO()
    # mtime=0 pins the gzip header → byte-reproducible records
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(payload)
    body = buf.getvalue()
    return pd.DataFrame(
        {
            "sink": [pdf["sink"].iloc[0]],
            "shard_id": [pdf["shard_id"].iloc[0]],
            "batch_no": [int(pdf["batch_no"].iloc[0])],
            # first span's partition key in the defined order
            # (shard_encoder.go:211)
            "partition_key": [pdf["conv_id"].iloc[0]],
            "span_count": [len(pdf)],
            "uncompressed_bytes": [int(len(payload))],
            "compressed_bytes": [int(len(RECORD_MAGIC) + len(body))],
            "data": [RECORD_MAGIC + body],
        }
    )


def encode_records(packed: DataFrame) -> DataFrame:
    """packed rows (sink, shard_id, batch_no, conv_id, turn_idx, text, …)
    → one encoded record per (sink, shard_id, batch_no).

    applyInPandas = grouped Arrow transfer; the ONLY Python on the sink
    path, as the north_star prescribes for the encode boundary.
    """
    return packed.select(
        "sink", "shard_id", "batch_no", "conv_id", "turn_idx", "text"
    ).groupBy("sink", "shard_id", "batch_no").applyInPandas(
        _encode_group, RECORD_SCHEMA
    )


def decode_record(data: bytes) -> list[tuple[str, int, str]]:
    """Decode oracle (pure Python, exporter_test.go:200-228 analog):
    validate magic, gunzip, split lines → (conv_id, turn_idx, text)."""
    if data[: len(RECORD_MAGIC)] != RECORD_MAGIC:
        raise ValueError("bad record magic")
    payload = gzip.decompress(data[len(RECORD_MAGIC):]).decode("utf-8")
    out = []
    for line in payload.split("\n"):
        conv_id, turn_idx, text = line.split("\t", 2)
        out.append((conv_id, int(turn_idx), text))
    return out
