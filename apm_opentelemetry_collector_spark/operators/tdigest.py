"""Distributed t-digest quantiles (Dunning & Ertl's merging digest).

Approximate quantiles with bounded state and tail-accurate resolution —
the sketch a 100 TB telemetry rollup uses where exact percentile_disc
would need a full sort. Two-level plan:

  1. partial digests: rows are salted into (group, salt) cells by a
     hash of a unique column (NOT the physical partition id — so the
     result is deterministic at any parallelism), and one Arrow batch
     per cell builds a ≤O(delta)-centroid digest from its sorted values
     (applyInPandas; vectorized numpy inside);
  2. merge: per group, the ≤ n_partials × O(delta) partial centroids
     are sorted by mean and re-merged into the final digest, which
     emits the requested quantiles.

State is bounded by construction (delta centroids per digest), the
heavy stage is map-side parallel across n_partials × n_groups cells,
and the merge input per group is a few KB. At larger scale raise
n_partials so each cell's values fit one Arrow batch.

Python appears only as Arrow batches (applyInPandas) — the same budget
the parse twin and media decode use; there is no Column-expression
t-digest, which is exactly the "custom operator" escape hatch the
brief allows.

Oracle note: the digest is deterministic (hash salting + sorted
merges) but not SQL-expressible, so the driver check is rows-only;
tests assert the estimates bracket the exact quantiles (computed by
DuckDB) within rank tolerance and that results are bit-identical
across repartitionings.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELTA = 100
N_PARTIALS = 32


def _k1(q: float, delta: float) -> float:
    """t-digest scale function k1: fine-grained near q=0/1 (tail accuracy)."""
    return delta / (2.0 * math.pi) * math.asin(2.0 * q - 1.0)


def _merge(means: np.ndarray, weights: np.ndarray, delta: float):
    """Greedy merge of (mean, weight) points sorted by mean into
    ≤O(delta) centroids under the k1 size limit. Deterministic for a
    fixed input order."""
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    w_done = 0.0  # weight already flushed to out
    k_lim = _k1(0.0, delta) + 1.0
    for m, w in zip(means[1:], weights[1:]):
        m, w = float(m), float(w)
        if _k1(min((w_done + cur_w + w) / total, 1.0), delta) <= k_lim:
            cur_w += w
            cur_m += (m - cur_m) * (w / cur_w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_done += cur_w
            k_lim = _k1(w_done / total, delta) + 1.0
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def _quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Estimate the q-quantile by linear interpolation between centroid
    centers (cumulative weight − w/2), clamped to the extreme means."""
    total = float(weights.sum())
    if len(means) == 1:
        return float(means[0])
    centers = np.cumsum(weights) - weights / 2.0
    t = q * total
    if t <= centers[0]:
        return float(means[0])
    if t >= centers[-1]:
        return float(means[-1])
    i = int(np.searchsorted(centers, t))
    if centers[i] == centers[i - 1]:
        return float(means[i])
    frac = (t - centers[i - 1]) / (centers[i] - centers[i - 1])
    return float(means[i - 1] + frac * (means[i] - means[i - 1]))


def tdigest_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    salt_from: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    delta: float = DELTA,
    n_partials: int = N_PARTIALS,
) -> DataFrame:
    """Per-group t-digest quantile estimates.

    salt_from: a unique (or near-unique) column whose hash spreads each
    group's rows over n_partials digest cells — determinism comes from
    hashing DATA, never the physical partition id.

    Output: group_cols..., q (double), est (double).
    """
    qs = [float(q) for q in qs]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    gschema = ", ".join(f"`{c}` {types[c]}" for c in group_cols)
    partial_schema = f"{gschema}, mean double, weight double"
    out_schema = f"{gschema}, q double, est double"

    base = df.select(
        *group_cols,
        F.col(value_col).cast("double").alias("_v"),
        F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_partials)).alias("_salt"),
    ).filter(F.col("_v").isNotNull())

    def build_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = np.sort(pdf["_v"].to_numpy(dtype=float))
        m, w = _merge(vals, np.ones(len(vals)), delta)
        out = pd.DataFrame({"mean": m, "weight": w})
        for c in group_cols:
            out[c] = pdf[c].iloc[0]
        return out[[*group_cols, "mean", "weight"]]

    partials = base.groupBy(*group_cols, "_salt").applyInPandas(
        build_partial, partial_schema
    )

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["mean", "weight"], kind="mergesort")
        m, w = _merge(
            pdf["mean"].to_numpy(dtype=float), pdf["weight"].to_numpy(dtype=float), delta
        )
        out = pd.DataFrame({"q": qs, "est": [_quantile(m, w, q) for q in qs]})
        for c in group_cols:
            out[c] = pdf[c].iloc[0]
        return out[[*group_cols, "q", "est"]]

    return partials.groupBy(*group_cols).applyInPandas(finalize, out_schema)


# --- SQL-composable digest aggregates ---------------------------------------
#
# The applyInPandas operator above is the engine-side scale path; these
# expose the SAME sketch as groupBy-composable aggregate functions so
# quantiles compose with the SQL surface (sources/sql_api.py):
#
#   SELECT g, tdigest_quantile(tdigest_agg(value), 0.5) FROM t GROUP BY g
#
# A digest travels as array<double> of interleaved [mean0, weight0,
# mean1, weight1, ...] — mergeable, bounded at O(delta) elements. Since
# a grouped-agg pandas UDF ships the group's RAW values to one
# aggregator (Spark's pandas grouped aggregates do no partial
# aggregation), the scalable SQL idiom is the same two-level salting the
# operator uses internally, now expressible in pure SQL:
#
#   SELECT g, tdigest_quantile(tdigest_merge_agg(d), 0.99)
#   FROM (SELECT g, tdigest_agg(value) AS d
#         FROM t GROUP BY g, hash(id) % 32)
#   GROUP BY g
#
# — the inner level bounds each aggregator's input, the outer level
# merges O(delta)-sized digests. Tests assert two-level == single-level
# within the digest's rank tolerance.


def _encode_digest(m: "np.ndarray", w: "np.ndarray") -> list:
    out = np.empty(2 * len(m))
    out[0::2], out[1::2] = m, w
    return [float(x) for x in out]


def _merge_encoded(arrs, delta: float):
    """Merge encoded digests (or raise on empties): concatenate
    centroids, sort by (mean, weight) — deterministic — and re-merge."""
    ms = np.concatenate([np.asarray(a, dtype=float)[0::2] for a in arrs])
    ws = np.concatenate([np.asarray(a, dtype=float)[1::2] for a in arrs])
    order = np.lexsort((ws, ms))
    return _merge(ms[order], ws[order], delta)


def make_digest_udfs(delta: float = DELTA):
    """Build (tdigest_agg, tdigest_merge_agg, tdigest_quantile) pandas
    UDFs. Arrow-batched only (grouped aggregates run as AggregateInPandas,
    the quantile as ArrowEvalPython) — no row-at-a-time Python."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def tdigest_agg(v: pd.Series) -> list:
        vals = np.sort(v.dropna().to_numpy(dtype=float))
        if len(vals) == 0:
            return None
        m, w = _merge(vals, np.ones(len(vals)), delta)
        return _encode_digest(m, w)

    @pandas_udf("array<double>")
    def tdigest_merge_agg(d: pd.Series) -> list:
        arrs = [a for a in d if a is not None and len(a)]
        if not arrs:
            return None
        m, w = _merge_encoded(arrs, delta)
        return _encode_digest(m, w)

    @pandas_udf("double")
    def tdigest_quantile(d: pd.Series, q: pd.Series) -> pd.Series:
        out = []
        for arr, qq in zip(d, q):
            if arr is None or len(arr) == 0:
                out.append(None)
                continue
            a = np.asarray(arr, dtype=float)
            out.append(_quantile(a[0::2], a[1::2], float(qq)))
        return pd.Series(out, dtype="float64")

    return tdigest_agg, tdigest_merge_agg, tdigest_quantile


def lint_digest_sql(sql: str, warn: bool = True) -> list[str]:
    """Flag the naive single-level digest form in hand-written SQL.

    Grouped-aggregate pandas UDFs do NO partial aggregation: a plain
    ``GROUP BY k`` over ``tdigest_agg(v)`` ships EVERY raw value of a
    group to one aggregator — the 100-TB OOM trap the two-level salted
    idiom (inner GROUP BY carries a salt, outer ``tdigest_merge_agg``
    merges O(δ) digests) exists to close. ``tdigest_quantiles_sql``
    (sources/sql_api.py) GENERATES the safe form; this lint covers the
    user who hand-writes the naive one anyway.

    Heuristic: any statement that calls ``tdigest_agg`` without a
    ``tdigest_merge_agg`` merge level is flagged (the generator's
    output always contains both, so it lints clean). A user splitting
    the two levels across separate statements may false-positive —
    this is a lint, not a gate. Returns the finding strings; also
    emits a UserWarning per finding unless ``warn=False``.
    """
    import re as _re
    import warnings as _warnings

    findings: list[str] = []
    has_agg = _re.search(r"\btdigest_agg\s*\(", sql, _re.IGNORECASE)
    has_merge = _re.search(r"\btdigest_merge_agg\s*\(", sql, _re.IGNORECASE)
    if has_agg and not has_merge:
        findings.append(
            "naive single-level tdigest_agg GROUP BY: grouped-agg pandas "
            "UDFs do no partial aggregation, so one aggregator receives "
            "every raw value of its group (OOM at scale). Use the "
            "two-level salted idiom — sources.sql_api.tdigest_quantiles_sql "
            "generates it."
        )
    if warn:
        for f in findings:
            _warnings.warn(f, UserWarning, stacklevel=2)
    return findings


def register_digest_sql(spark, delta: float = DELTA) -> list[str]:
    """Register the digest aggregates for spark.sql use. Returns names.

    NOTE: ``tdigest_agg`` in a plain single-level ``GROUP BY`` is the
    100-TB OOM trap (no partial aggregation in grouped-agg pandas
    UDFs). Run hand-written digest SQL through ``lint_digest_sql``
    first, or generate it with ``sources.sql_api.tdigest_quantiles_sql``
    which always emits the safe two-level salted form."""
    agg, merge, quant = make_digest_udfs(delta)
    spark.udf.register("tdigest_agg", agg)
    spark.udf.register("tdigest_merge_agg", merge)
    spark.udf.register("tdigest_quantile", quant)
    return ["tdigest_agg", "tdigest_merge_agg", "tdigest_quantile"]
