"""Gap-fill resampling: project irregular time series onto a fixed grid.

The telemetry twin of a rollup/downsample stage: for each series key,
emit one row per grid timestamp carrying the latest observation at or
before it (forward fill; NULL before the first observation).

Spark-first: the grid is `sequence(start, stop, interval)` exploded per
distinct key — no driver loop — and the fill is the distributed as-of
join (operators/asof.py), so the whole operator is one shuffle + one
window sort over |grid| + |points| rows. At 100 TB the grid is tiny
relative to the points and rides the same (key, ts) sort the raw series
is already bucketed by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .asof import asof_join


def resample_ffill(
    series: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    start_ts: str,
    end_ts: str,
    step_seconds: int,
) -> DataFrame:
    """One row per (key, grid ts) with forward-filled value_cols.

    series must have at most one row per (key, ts) — pre-aggregate ties
    (max_by) for determinism, as with asof_join.
    """
    keys = series.select(*key_cols).distinct()
    grid = keys.select(
        *key_cols,
        F.explode(
            F.sequence(
                F.lit(start_ts).cast("timestamp"),
                F.lit(end_ts).cast("timestamp"),
                F.expr(f"interval {step_seconds} seconds"),
            )
        ).alias(ts_col),
    )
    right = series.select(*key_cols, ts_col, *value_cols)
    return asof_join(grid, right, key_cols, ts_col, value_cols)
