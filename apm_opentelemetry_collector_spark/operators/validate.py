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

    Evaluated with F.first over the (conv_id, turn_idx)-sorted running
    window — the SAME window spec forward_fill uses — so Catalyst plans
    one exchange + one sort for both operators (verified in the physical
    plan: a single Window node carries all the expressions).
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    first_role = F.first(F.col("role"), ignorenulls=False).over(w)
    return df.withColumn("conv_invalid", first_role.isNull())


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
