"""Ingest validation — protocol filter + backpressure semantics.

Reference behavior (receiver/opencensusreceiver/octrace/opencensus.go):
  - F1 Node-required protocol filter: the FIRST message of a stream (or a
    unary request) without a Node is rejected wholesale
    (opencensus.go:81-82,113-122; test opencensus_test.go:308-371).
    Transcript analog: a conversation whose first turn (min turn_idx) has
    NULL role is invalid — every row of that conversation is refused.
  - S4 backpressure toggle (config.go:47, matrix test
    opencensus_test.go:410-590): with backpressure ON the failure is
    surfaced (rows counted REFUSED); with backpressure OFF the RPC
    succeeds and data is silently dropped (rows counted DROPPED).

The split is one window min + a boolean column — no extra shuffle beyond
the conv_id partitioning every later stage reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import OUTCOME_DROPPED, OUTCOME_REFUSED


def flag_protocol_violations(df: DataFrame) -> DataFrame:
    """Add bool `conv_invalid`: conversation's first turn lacks role.

    Uses min_by over the conv_id window so it works even if turn_idx does
    not start at 0 for some conversation.
    """
    w = Window.partitionBy("conv_id")
    first_role = F.min_by(F.col("role"), F.col("turn_idx")).over(w)
    # min_by ignores NULL `role` rows, so instead: detect via the turn with
    # the minimum turn_idx having a NULL role.
    min_turn = F.min("turn_idx").over(w)
    has_null_first = F.max(
        F.when((F.col("turn_idx") == min_turn) & F.col("role").isNull(), 1).otherwise(0)
    ).over(w)
    _ = first_role  # documented alternative; the null-safe variant is used
    return df.withColumn("conv_invalid", has_null_first == 1)


def split_valid(
    df: DataFrame, backpressure_on: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(valid_rows, rejected_rows_with_outcome).

    rejected rows carry outcome = 'refused' (backpressure on) or
    'dropped' (backpressure off) per the S4 matrix.
    """
    flagged = flag_protocol_violations(df)
    valid = flagged.filter(~F.col("conv_invalid")).drop("conv_invalid")
    outcome = OUTCOME_REFUSED if backpressure_on else OUTCOME_DROPPED
    rejected = (
        flagged.filter(F.col("conv_invalid"))
        .drop("conv_invalid")
        .withColumn("outcome", F.lit(outcome))
    )
    return valid, rejected
