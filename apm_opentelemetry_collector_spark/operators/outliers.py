"""Robust outlier detection — median/MAD modified z-score.

The quality-filtering operator a curation pass runs over numeric
telemetry (latency, value, length): mean/stddev z-scores are themselves
corrupted by the outliers they hunt, so the robust form uses the median
and the median absolute deviation (Iglewicz–Hoban modified z-score,
0.6745·(x−med)/MAD, flag |z| > 3.5).

Two medians, two ways of computing them:

  scale=False (default, the ORACLE form): exact-percentile aggregates
  (Spark `percentile` ≡ DuckDB `quantile_cont`, both linear
  interpolation — the same parity value_percentiles relies on). Spark's
  exact percentile buffers every group's values inside one aggregator,
  so this form is bounded by the largest group fitting executor memory
  — fine at bench scale, an OOM at 100 TB with a handful of groups.

  scale=True (the 100-TB path): both medians come from the t-digest
  sketch (operators/tdigest.py) — salted Arrow-batch partials, bounded
  O(delta) centroids per group, never a full-group value buffer. The
  digest's rank error is ≤ ~0.03 at the median, which perturbs med/MAD
  by at most the local value density — tests assert the flagged set
  matches the exact form on the fixtures (|z| > 3.5 outliers sit far
  from the median, so a small med/MAD wobble doesn't flip them).

Shared tail either way: two joins against the tiny per-group stats
(config-bounded, AQE broadcasts them) and a codegen'd z filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAD_SCALE = 0.6745  # Φ⁻¹(0.75): makes MAD consistent with σ for normals
Z_CUT = 3.5


def robust_zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    id_cols: list[str],
    z_cut: float = Z_CUT,
    scale: bool = False,
    salt_from: str | None = None,
) -> DataFrame:
    """Rows whose modified z-score exceeds z_cut within their group.

    Output: id_cols..., group_cols..., value, z (rounded 6dp).
    Groups with MAD = 0 (over half the values identical) flag nothing —
    division yields NULL/inf filtered out, matching the SQL twin.

    scale=True swaps both exact per-group medians for t-digest
    estimates (bounded state — the form that survives 100×);
    salt_from names the near-unique column that salts the digest
    partials (defaults to the first id column).
    """
    v = F.col(value_col).cast("double")
    if scale:
        from .tdigest import tdigest_quantiles

        salt = salt_from or id_cols[0]
        med = tdigest_quantiles(df, value_col, group_cols, salt, qs=(0.5,)).select(
            *group_cols, F.col("est").alias("_med")
        )
        dev = df.join(med, group_cols).withColumn("_ad", F.abs(v - F.col("_med")))
        mad = tdigest_quantiles(dev, "_ad", group_cols, salt, qs=(0.5,)).select(
            *group_cols, F.col("est").alias("_mad")
        )
    else:
        med = df.groupBy(*group_cols).agg(
            F.expr(f"percentile({value_col}, 0.5)").alias("_med")
        )
        dev = df.join(med, group_cols).withColumn("_ad", F.abs(v - F.col("_med")))
        mad = dev.groupBy(*group_cols).agg(
            F.expr("percentile(_ad, 0.5)").alias("_mad")
        )
    z = (F.lit(MAD_SCALE) * (v - F.col("_med"))) / F.col("_mad")
    return (
        dev.join(mad, group_cols)
        .withColumn("_z", z)
        .filter(F.col("_mad") > 0)
        .filter(F.abs(F.col("_z")) > z_cut)
        .select(
            *id_cols,
            *group_cols,
            v.alias("value"),
            F.round("_z", 6).alias("z"),
        )
    )


def robust_zscore_sql(
    table: str,
    value_col: str,
    group_col: str,
    id_col: str,
    z_cut: float = Z_CUT,
) -> str:
    """DuckDB twin (same op order: (0.6745*(v-med))/mad)."""
    return f"""
WITH med AS (
  SELECT {group_col}, quantile_cont({value_col}, 0.5) AS _med
  FROM {table} GROUP BY {group_col}
), dev AS (
  SELECT t.{id_col}, t.{group_col}, CAST(t.{value_col} AS DOUBLE) AS v,
         m._med, abs(CAST(t.{value_col} AS DOUBLE) - m._med) AS _ad
  FROM {table} t JOIN med m USING ({group_col})
), mad AS (
  SELECT {group_col}, quantile_cont(_ad, 0.5) AS _mad
  FROM dev GROUP BY {group_col}
)
SELECT d.{id_col}, d.{group_col}, d.v AS value,
       round(({MAD_SCALE} * (d.v - d._med)) / a._mad, 6) AS z
FROM dev d JOIN mad a USING ({group_col})
WHERE a._mad > 0 AND abs(({MAD_SCALE} * (d.v - d._med)) / a._mad) > {z_cut}"""
