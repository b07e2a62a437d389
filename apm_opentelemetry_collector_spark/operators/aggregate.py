"""Metric aggregations — the obsreport / OpenCensus stats-view analog.

Every reference aggregation is a streaming Sum/Count/LastValue grouped by
tag keys (exporter/omnishard/telemetry.go:56-190; receiver counts at
octrace/opencensus.go:184-212) — exactly groupBy().agg() (SURVEY.md §2.5).

The flagship A9 aggregate (north_star): per-sink accepted/refused/dropped
counts grouped by (conv_id-bucket, role, tool), computed with SALTED
repartitioning to defuse hot-conversation skew. Catalyst already performs
partial (map-side) + final aggregation; salting adds an explicit extra
pre-aggregation on (keys, salt) so a single hot (bucket, role, tool) group
is split across `salt_buckets` reducers before the final combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig


def conv_bucket_col(n_buckets: int = 16) -> F.Column:
    """Deterministic conversation bucket from the numeric id suffix.

    'conv-00000013' → 13 % n_buckets. Pure string arithmetic so a SQL
    oracle reproduces it; Iceberg's bucket(conv_id) transform is the
    production twin (north_star partitioning). Non-numeric suffixes
    (ANSI cast would throw) fall back to a uniform hash bucket.
    """
    num = F.expr("try_cast(substring(conv_id, 6) as bigint)")
    return (
        F.coalesce(num, F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets))) % n_buckets
    ).alias("conv_bucket")


def sink_outcome_counts(
    routed_with_outcome: DataFrame,
    cfg: PipelineConfig | None = None,
    salted: bool = True,
) -> DataFrame:
    """A9: per (sink, conv_bucket, role, tool, outcome) row counts.

    salted=True inserts a two-phase aggregation: group on (keys ⊕ salt)
    first, then re-aggregate without the salt. The salt is derived from
    turn_idx (deterministic, uniform within a conversation) rather than
    rand() so results are reproducible and the pre-aggregation actually
    splits the hot conversation's rows.
    """
    cfg = cfg or PipelineConfig()
    keys = ["sink", "conv_bucket", "role", "tool", "outcome"]
    df = routed_with_outcome.withColumn("conv_bucket", conv_bucket_col(cfg.n_conv_buckets))
    if salted:
        salt = (F.col("turn_idx") % cfg.salt_buckets).alias("_salt")
        partial = df.groupBy(*keys, salt).agg(F.count("*").alias("_n"))
        return partial.groupBy(*keys).agg(F.sum("_n").cast("bigint").alias("n"))
    return df.groupBy(*keys).agg(F.count("*").alias("n"))


def receiver_counts(valid: DataFrame, rejected: DataFrame) -> DataFrame:
    """A7: received/refused span counts per receiver tag.

    The reference tags receiver counts 'oc_trace' (stream) / restructures
    per receiver (octrace/observability_test.go:41-96). The batch engine
    has one logical receiver; counts split by admission outcome.
    """
    acc = valid.agg(F.count("*").alias("n")).select(
        F.lit("transcripts").alias("receiver"),
        F.lit("received").alias("status"),
        F.col("n"),
    )
    ref = rejected.agg(F.count("*").alias("n")).select(
        F.lit("transcripts").alias("receiver"),
        F.col("n"),
    ).select("receiver", F.lit("refused").alias("status"), "n")
    return acc.unionByName(ref)


def flushed_stats(records: DataFrame) -> DataFrame:
    """A1/A8: per (sink, shard) flushed spans / batches / bytes.

    Mirrors omnishard_flushed_* views (telemetry.go:56-78): Sum of span
    counts, Count of records, Sum of uncompressed bytes.
    """
    return records.groupBy("sink", "shard_id").agg(
        F.sum("span_count").cast("bigint").alias("flushed_spans"),
        F.count("*").alias("flushed_batches"),
        F.sum("uncompressed_bytes").cast("bigint").alias("flushed_bytes"),
    )


def dropped_stats(routed_with_outcome: DataFrame) -> DataFrame:
    """A5: per (sink, drop_reason) dropped spans (telemetry.go:136-162)."""
    return (
        routed_with_outcome.filter(F.col("outcome") == "dropped")
        .groupBy("sink", "drop_reason")
        .agg(F.count("*").alias("dropped_spans"))
    )


def compress_stats(encoded_records: DataFrame) -> DataFrame:
    """A4: per (sink, shard) last compress factor, integer division.

    The reference computes uncompressed/compressed with Go integer
    division (hooks.go:120-126) and records LastValue per shard
    (telemetry.go:128-134). 'Last' in the deterministic engine = last in
    (batch_no) order.
    """
    return encoded_records.groupBy("sink", "shard_id").agg(
        F.max_by(
            (F.col("uncompressed_bytes") / F.col("compressed_bytes")).cast("bigint"),
            F.col("batch_no"),
        ).alias("compress_factor")
    )
