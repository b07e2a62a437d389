"""Routing — pipeline fan-out + deterministic send outcomes.

Reference semantics:
  - J6 pipeline fan-out: a batch entering pipeline P is delivered to every
    exporter of P; several pipelines can share a receiver, so one span can
    reach several sinks (service.pipelines YAML,
    receiver/opencensusreceiver/testdata/config.yaml:24-29).
  - T6/A5/A6 send outcomes: each record send ends SUCCESS /
    FAILED_NOT_RETRYABLE (drop) / FAILED_RETRYABLE (retry)
    (exporter/omnishard/exporter.go:240-290). In the deterministic batch
    engine, transient retryable failures are invisible (retries converge);
    the observable taxonomy is accepted vs dropped, keyed per (row, sink).

Spark-first: fan-out is an inner theta-join of turns against the tiny
broadcast routes table on ('*' OR exact)-match predicates — one
BroadcastNestedLoopJoin, no shuffle of the fact side, output multiplicity
= number of matching pipelines. The deterministic drop rule hashes
(conv_id, turn_idx, sink) so the same row can succeed on one sink and
drop on another, like independent per-exporter sends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import (
    DROP_SEND_NOT_RETRYABLE,
    OUTCOME_ACCEPTED,
    OUTCOME_DROPPED,
    PipelineConfig,
)


def fan_out(turns: DataFrame, routes: DataFrame) -> DataFrame:
    """turns × matching routes (inner join; may multiply rows).

    NULL role/tool matches only '*' patterns (SQL equality semantics) —
    unset attributes never satisfy exact matchers, as in the reference's
    attribute matching.
    """
    cond = (
        (F.col("role_pattern") == "*") | (F.col("role_pattern") == F.col("role"))
    ) & ((F.col("tool_pattern") == "*") | (F.col("tool_pattern") == F.col("tool")))
    return turns.join(F.broadcast(routes), cond, "inner")


def with_send_outcome(routed: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """Deterministic per-(row, sink) send outcome + drop reason.

    outcome = dropped iff md5(conv_id:turn_idx:sink) starts with
    cfg.drop_md5_prefix (~0.39% at the default 'ff') — the batch-engine
    stand-in for FAILED_NOT_RETRYABLE sends (exporter.go:252-255), chosen
    so a pure-SQL oracle reproduces it exactly.
    """
    cfg = cfg or PipelineConfig()
    sig = F.md5(
        F.concat(
            F.col("conv_id"),
            F.lit(":"),
            F.col("turn_idx").cast("string"),
            F.lit(":"),
            F.col("sink"),
        ).cast("binary")
    )
    is_drop = F.substring(sig, 1, len(cfg.drop_md5_prefix)) == cfg.drop_md5_prefix
    return routed.withColumn(
        "outcome", F.when(is_drop, OUTCOME_DROPPED).otherwise(OUTCOME_ACCEPTED)
    ).withColumn(
        "drop_reason",
        F.when(is_drop, F.lit(DROP_SEND_NOT_RETRYABLE)).otherwise(F.lit(None).cast("string")),
    )


def write_sinks(routed: DataFrame, out_dir: str) -> None:
    """One fan-out write, partitioned by sink — each sink is a directory.

    Equivalent to N per-exporter writes but with a single pass over the
    data; partition pruning makes per-sink reads cheap. At cluster scale
    this is the move that avoids re-scanning the fact table once per sink.
    """
    (
        routed.write.mode("overwrite")
        .partitionBy("sink")
        .parquet(out_dir)
    )
