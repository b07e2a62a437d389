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
