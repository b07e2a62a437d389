"""Record encoding — the sink-side byte format (P5/P6, A4).

Reference (exporter/omnishard/shard_encoder.go): a flushed record's bytes
are `magic[8] ++ gzip(proto(SpanList))` (magic shard_encoder.go:35, gzip
framing :308-322, record assembly :209-214); per-record stats are
spanCount and uncompressedBytes; the compress-factor metric is the
integer division uncompressed/compressed (hooks.go:120-126).

This engine is NOT a byte-parity port (different span schema), but the
framing is the reference's exactly: 8-byte magic prefix, gzip body,
per-record stats, and — under framing='proto' — a protobuf WIRE-FORMAT
body (varint tag-length-value; TurnList{repeated Turn{conv_id=1,
turn_idx=2, text=3}}), the structural twin of SpanList. The decode
oracle exercises the identical shape the reference's e2e test uses
(exporter_test.go:200-228: validate magic, gunzip, decode, count spans),
and the size probe reuses the same bytes (single encode — fixing the
reference's double-marshal TODO, shard_encoder.go:146-150).

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


# --- protobuf wire format (LEB128 varints, tag-length-value) -----------------
# message Turn     { string conv_id = 1; int64 turn_idx = 2; string text = 3; }
# message TurnList { repeated Turn turns = 1; }


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, i: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = data[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _proto_turn(conv_id: str, turn_idx: int, text: str) -> bytes:
    c, t = conv_id.encode(), text.encode()
    return (
        b"\x0a" + _varint(len(c)) + c          # field 1, wire 2
        + b"\x10" + _varint(turn_idx)          # field 2, wire 0
        + b"\x1a" + _varint(len(t)) + t        # field 3, wire 2
    )


def _proto_payload(pdf: pd.DataFrame) -> bytes:
    turns = (
        _proto_turn(str(c), int(i), str(t))
        for c, i, t in zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"])
    )
    # each turn is field 1 (wire 2) of TurnList
    return b"".join(b"\x0a" + _varint(len(m)) + m for m in turns)


def _decode_proto_payload(payload: bytes) -> list[tuple[str, int, str]]:
    out = []
    i = 0
    while i < len(payload):
        assert payload[i] == 0x0A
        ln, i = _read_varint(payload, i + 1)
        m, i = payload[i : i + ln], i + ln
        j = 0
        conv_id = text = ""
        turn_idx = 0
        while j < len(m):
            tag = m[j]
            if tag == 0x0A:
                ln2, j = _read_varint(m, j + 1)
                conv_id, j = m[j : j + ln2].decode(), j + ln2
            elif tag == 0x10:
                turn_idx, j = _read_varint(m, j + 1)
            elif tag == 0x1A:
                ln2, j = _read_varint(m, j + 1)
                text, j = m[j : j + ln2].decode(), j + ln2
            else:
                # Deliberately STRICTER than proto semantics: this is a
                # test oracle for our own encoder, so an unknown tag (or a
                # field number > 15, which would need a multi-byte tag)
                # means the encoder changed — fail loudly instead of
                # skipping like a lenient proto reader would.
                raise ValueError(f"unexpected tag {tag:#x}")
        out.append((conv_id, int(turn_idx), text))
    return out


def _lines_payload(pdf: pd.DataFrame) -> bytes:
    lines = (
        pdf["conv_id"].astype(str)
        + "\t"
        + pdf["turn_idx"].astype(str)
        + "\t"
        + pdf["text"].astype(str)
    )
    return "\n".join(lines).encode("utf-8")


def _encode_group(pdf: pd.DataFrame, framing: str = "lines") -> pd.DataFrame:
    pdf = pdf.sort_values(["conv_id", "turn_idx"])
    payload = (
        _proto_payload(pdf) if framing == "proto" else _lines_payload(pdf)
    )
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


def encode_records(packed: DataFrame, framing: str = "lines") -> DataFrame:
    """packed rows (sink, shard_id, batch_no, conv_id, turn_idx, text, …)
    → one encoded record per (sink, shard_id, batch_no).

    framing='lines' (default): newline-joined TSV turns — the log-shipping
    record. framing='proto': protobuf wire-format TurnList — the
    reference's record shape (magic ++ gzip(proto(list))).

    applyInPandas = grouped Arrow transfer; the ONLY Python on the sink
    path, as the north_star prescribes for the encode boundary.
    """
    if framing not in ("lines", "proto"):
        raise ValueError(f"unknown framing {framing!r}")

    def group_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _encode_group(pdf, framing)

    return packed.select(
        "sink", "shard_id", "batch_no", "conv_id", "turn_idx", "text"
    ).groupBy("sink", "shard_id", "batch_no").applyInPandas(
        group_fn, RECORD_SCHEMA
    )


def decode_record(data: bytes, framing: str = "lines") -> list[tuple[str, int, str]]:
    """Decode oracle (pure Python, exporter_test.go:200-228 analog):
    validate magic, gunzip, parse body → (conv_id, turn_idx, text)."""
    if data[: len(RECORD_MAGIC)] != RECORD_MAGIC:
        raise ValueError("bad record magic")
    payload = gzip.decompress(data[len(RECORD_MAGIC):])
    if framing == "proto":
        return _decode_proto_payload(payload)
    out = []
    for line in payload.decode("utf-8").split("\n"):
        conv_id, turn_idx, text = line.split("\t", 2)
        out.append((conv_id, int(turn_idx), text))
    return out
