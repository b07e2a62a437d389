"""Distributed as-of join (backward: latest right row with ts ≤ left ts).

Spark has no native ASOF JOIN; the naive expression is a range theta-join
(quadratic per key). The scalable re-expression is the union trick:

    union(left tagged 1, right tagged 0)
    → one window sort on (key, ts, tag)
    → last(value, ignorenulls) over unbounded-preceding
    → keep left rows

One shuffle + one sort over |L|+|R| rows, no per-row range scan — the
same cost shape as the pipeline's forward-fill window, because it IS a
forward fill of right values through the merged timeline. Inclusive at
equal timestamps (the right row sorts first via the tag, matching
DuckDB's `ASOF LEFT JOIN ... ON l.ts >= r.ts`, which oracles this
operator in __spark_entry__).

At 100 TB: partition by key (conversation/user), sort within — exactly
the layout the transcript table is already bucketed by; a hot key
serializes its own timeline only (same trade, and same measured escape
hatches, as operators/forward_fill.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join.

    right must carry exactly key_cols + [ts_col] + value_cols, at most one
    row per (key, ts) (pre-aggregate ties with max_by for determinism),
    and value_cols must not collide with left's columns. Left rows with
    no earlier right row get NULL values.
    """
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {overlap}")
    l = left.withColumn("_asof_k", F.lit(1))
    r = right.select(*key_cols, ts_col, *value_cols).withColumn(
        "_asof_k", F.lit(0)
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_asof_k").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in value_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_asof_k") == 1).drop("_asof_k")
