"""t-digest quantile sketch: accuracy (rank tolerance vs exact),
determinism across parallelism, and bounded sketch size."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from apm_opentelemetry_collector_spark.operators.tdigest import (
    DELTA,
    _merge,
    tdigest_quantiles,
)
from tests.conftest import SF_TINY

QS = (0.1, 0.5, 0.9, 0.99)


def _events(spark):
    return spark.read.parquet(f"{SF_TINY}/events.parquet")


def test_tdigest_within_rank_tolerance(spark):
    """Each estimate must land between the exact quantiles at q ± 0.03 —
    the rank-error guarantee a t-digest is built for."""
    est = {
        (r["event_type"], r["q"]): r["est"]
        for r in tdigest_quantiles(
            _events(spark), "value", ["event_type"], "event_id", QS
        ).collect()
    }
    by_type = {
        r["event_type"]: r["vals"]
        for r in _events(spark)
        .groupBy("event_type")
        .agg(F.collect_list("value").alias("vals"))
        .collect()
    }
    assert len(est) == len(by_type) * len(QS)
    for (etype, q), e in est.items():
        vals = np.sort(np.array(by_type[etype]))
        lo = np.quantile(vals, max(q - 0.03, 0.0))
        hi = np.quantile(vals, min(q + 0.03, 1.0))
        assert lo - 1e-9 <= e <= hi + 1e-9, (etype, q, e, lo, hi)


def test_tdigest_deterministic_across_parallelism(spark):
    """Salting by data hash (not partition id) makes the digest
    bit-identical at any repartitioning."""
    ev = _events(spark)
    a = tdigest_quantiles(ev.repartition(3), "value", ["event_type"], "event_id", QS)
    b = tdigest_quantiles(ev.repartition(17), "value", ["event_type"], "event_id", QS)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb  # exact float equality — same merge order by construction


def test_merge_bounds_centroid_count():
    """The greedy k1 merge keeps O(delta) centroids from any input size."""
    rng_vals = np.sort((np.arange(200_000) * 2654435761 % 1_000_003).astype(float))
    m, w = _merge(rng_vals, np.ones(len(rng_vals)), DELTA)
    assert len(m) <= 2 * DELTA
    assert float(w.sum()) == float(len(rng_vals))
    assert np.all(np.diff(m) >= 0)  # means stay sorted


def test_tdigest_skewed_tail_accuracy(spark):
    """Tail quantile (q=0.99) on a heavy-tailed synthetic column must be
    far more accurate in rank than a uniform-bucket histogram would be:
    assert within ±0.01 rank."""
    n = 50_000
    df = spark.range(n).select(
        F.col("id"),
        F.lit("g").alias("g"),
        # deterministic heavy tail: x = 1/(1-u)^2 via a hash-derived u
        (
            1.0
            / F.pow(
                1.0 - (F.pmod(F.xxhash64("id"), F.lit(1 << 20)) / float(1 << 20)),
                F.lit(2.0),
            )
        ).alias("x"),
    )
    est = {
        r["q"]: r["est"]
        for r in tdigest_quantiles(df, "x", ["g"], "id", (0.99,)).collect()
    }
    vals = np.sort(np.array([r["x"] for r in df.select("x").collect()]))
    lo, hi = np.quantile(vals, 0.98), np.quantile(vals, 1.0)
    assert lo <= est[0.99] <= hi
