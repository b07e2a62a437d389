"""Probabilistic sampler — deterministic hash sampling (F4).

Reference: the upstream probabilisticsamplerprocessor (declared at
cmd/omnitelsvc/components.go:94) keeps a span iff a hash of its traceID
falls below the sampling-rate threshold — sampling is CONSISTENT per
trace, so whole conversations are kept or discarded together.

Spark-first: filter on a prefix of md5(conv_id). Using the first hex
nibble gives 1/16-granularity rates that a SQL oracle reproduces exactly;
a finer 16-bit variant uses F.conv (Spark-only, still deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_conversations_nibble(df: DataFrame, keep_nibbles: int = 4) -> DataFrame:
    """Keep conversations whose md5 first hex digit < keep_nibbles (k/16 rate)."""
    if not 0 <= keep_nibbles <= 16:
        raise ValueError("keep_nibbles in [0,16]")
    allowed = "0123456789abcdef"[:keep_nibbles]
    first = F.substring(F.md5(F.col("conv_id").cast("binary")), 1, 1)
    return df.filter(first.isin(*allowed) if allowed else F.lit(False))


def sample_conversations(df: DataFrame, rate: float) -> DataFrame:
    """Fine-grained consistent sampling: md5 16-bit prefix < rate * 65536."""
    threshold = int(rate * 65536)
    prefix16 = F.conv(F.substring(F.md5(F.col("conv_id").cast("binary")), 1, 4), 16, 10).cast("bigint")
    return df.filter(prefix16 < threshold)
