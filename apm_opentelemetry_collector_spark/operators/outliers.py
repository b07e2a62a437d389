"""Robust outlier detection — median/MAD modified z-score.

The quality-filtering operator a curation pass runs over numeric
telemetry (latency, value, length): mean/stddev z-scores are themselves
corrupted by the outliers they hunt, so the robust form uses the median
and the median absolute deviation (Iglewicz–Hoban modified z-score,
0.6745·(x−med)/MAD, flag |z| > 3.5).

Plan shape: two exact-percentile aggregates per group (Spark
`percentile` ≡ DuckDB `quantile_cont`, both linear interpolation — the
same parity value_percentiles relies on) + two joins against the tiny
per-group stats. Group cardinality is the config-bounded side, so AQE
broadcasts the stats; the fact table is scanned twice (med, then
deviations) — the classic two-pass exact-median trade. The t-digest
operator is the one-pass approximate swap at 100 TB.
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
) -> DataFrame:
    """Rows whose modified z-score exceeds z_cut within their group.

    Output: id_cols..., group_cols..., value, z (rounded 6dp).
    Groups with MAD = 0 (over half the values identical) flag nothing —
    division yields NULL/inf filtered out, matching the SQL twin.
    """
    v = F.col(value_col).cast("double")
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
