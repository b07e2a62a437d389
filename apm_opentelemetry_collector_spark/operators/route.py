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

from pyspark.sql import Window

from ..config import (
    DROP_RETRY_QUEUE_FULL,
    DROP_SEND_NOT_RETRYABLE,
    OUTCOME_ACCEPTED,
    OUTCOME_DROPPED,
    RESULT_FAILED_NOT_RETRYABLE,
    RESULT_FAILED_RETRYABLE,
    RESULT_SUCCESS,
    RETRY_QUEUE_SIZE,
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
    # one selectExpr instead of two withColumns (r7 construction-cost
    # pass; run_pipeline builds this per job submission)
    pfx = cfg.drop_md5_prefix
    sig = (
        "md5(CAST(concat(conv_id, ':', CAST(turn_idx AS STRING), ':', sink) "
        "AS BINARY))"
    )
    is_drop = f"(substring({sig}, 1, {len(pfx)}) = '{pfx}')"
    return routed.selectExpr(
        *routed.columns,
        f"CASE WHEN {is_drop} THEN '{OUTCOME_DROPPED}' "
        f"ELSE '{OUTCOME_ACCEPTED}' END AS outcome",
        f"CASE WHEN {is_drop} THEN '{DROP_SEND_NOT_RETRYABLE}' "
        "ELSE CAST(NULL AS STRING) END AS drop_reason",
    )


def with_retry_outcome(
    routed: DataFrame,
    cfg: PipelineConfig | None = None,
    retry_queue_size: int = RETRY_QUEUE_SIZE,
    retry_md5_prefix: str = "fe",
) -> DataFrame:
    """Retry-queue semantics (T6/O3) as deterministic columns.

    Reference: FAILED_RETRYABLE sends go to a bounded retry queue
    (capacity 10,000; exporter.go:31-33) and are re-sent until success
    (exporter.go:194-235); when the queue is full the batch is dropped
    with RetryQueueFull (exporter.go:213-221; drop code
    datadropcode.go:22).

    Batch re-expression: a row is RETRYABLE iff md5(conv:turn:sink)
    starts with `retry_md5_prefix` (disjoint from the non-retryable 'ff'
    rule). Retryable rows ultimately succeed — attempts = 2 — except
    those beyond the queue capacity per sink in the deterministic
    (conv_id, turn_idx) order, which become dropped(RetryQueueFull).
    The capacity check is a row_number window over retryable rows only
    (rows gated out contribute nothing, like the gated packing cumsum).

    Output columns: outcome, drop_reason, result_code, attempts.
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
    is_retry = F.substring(sig, 1, len(retry_md5_prefix)) == retry_md5_prefix
    w = Window.partitionBy("sink").orderBy("conv_id", "turn_idx")
    retry_seq = F.sum(F.when(is_retry, 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    overflow = is_retry & (retry_seq > retry_queue_size)

    outcome = (
        F.when(is_drop, OUTCOME_DROPPED)
        .when(overflow, OUTCOME_DROPPED)
        .otherwise(OUTCOME_ACCEPTED)
    )
    drop_reason = (
        F.when(is_drop, DROP_SEND_NOT_RETRYABLE)
        .when(overflow, DROP_RETRY_QUEUE_FULL)
        .otherwise(F.lit(None).cast("string"))
    )
    result_code = (
        F.when(is_drop, RESULT_FAILED_NOT_RETRYABLE)
        .when(is_retry & ~overflow, RESULT_FAILED_RETRYABLE)  # first attempt
        .when(overflow, RESULT_FAILED_RETRYABLE)
        .otherwise(RESULT_SUCCESS)
    )
    attempts = F.when(is_retry & ~overflow, 2).when(overflow | is_drop, 1).otherwise(1)
    return (
        routed.withColumn("outcome", outcome)
        .withColumn("drop_reason", drop_reason)
        .withColumn("result_code", result_code)
        .withColumn("attempts", attempts.cast("int"))
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
