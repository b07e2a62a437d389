"""Cumulative-counter deltas with reset handling.

SignalFx counter semantics (the CUMULATIVE_* → counter mapping in the
translator, opencensus_to_signalfx.go:28-88): a backend turns cumulative
counters into rates by differencing consecutive points; a DECREASE means
the source process restarted and the counter reset, so the delta is the
post-reset value itself, never a negative.

Spark-first: one lag window per series — the same (key, ts) sort the
rest of the pipeline uses; no state beyond the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def counter_delta(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
    out_col: str = "delta",
) -> DataFrame:
    """delta = v − lag(v) per series; v < lag(v) ⇒ reset ⇒ delta = v;
    first point ⇒ NULL (no baseline)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *(order_cols or []))
    v = F.col(value_col)
    prev = F.lag(v).over(w)
    delta = (
        F.when(prev.isNull(), F.lit(None))
        .when(v >= prev, v - prev)
        .otherwise(v)  # reset: the counter started over at v
    )
    return df.withColumn(out_col, delta)


def sliding_rate_exceeded(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    window_seconds: int,
    max_events: int,
) -> DataFrame:
    """Trailing-window rate limiting: rows where the count of the key's
    events in the preceding `window_seconds` (inclusive of the current
    row) exceeds `max_events` — the abuse/quota-detection query every
    ingest tier runs.

    One RANGE-frame window per key over epoch seconds: Spark's
    rangeBetween(-w, 0) ≡ SQL `RANGE BETWEEN w PRECEDING AND CURRENT
    ROW` over epoch(ts), integer counts → exact cross-engine parity.
    The frame is evaluated in a single per-key sort — no self-join
    blow-up — and keys partition the shuffle, so the plan scales with
    the usual salting escape hatch for a hot key.

    Output: key_cols..., ts, n_in_window.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).cast("timestamp").cast("long"))
        .rangeBetween(-window_seconds, 0)
    )
    return (
        df.withColumn("n_in_window", F.count("*").over(w).cast("bigint"))
        .filter(F.col("n_in_window") > max_events)
        .select(*key_cols, F.col(ts_col).alias("ts"), "n_in_window")
    )
