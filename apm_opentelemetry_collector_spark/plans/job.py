"""Materializing job runner — lineage manifests + checkpoint resume.

The reference's resilience machinery (retry queue exporter.go:194-235,
graceful drain encoder.go:226-263, SHARD_CONFIG_MISTMATCH re-send
exporter.go:260-267) exists because its pipeline is a lossy stream of
one-shot sends. The batch engine replaces it with idempotent partitioned
writes plus per-partition lineage manifests: work is divided into
conversation buckets; each bucket's outputs land under a bucket-scoped
directory and a manifest records (input rows, per-outcome counts, a
checksum). A killed job, re-invoked with the same arguments, REPLAYS ONLY
the buckets without a manifest (north_star: "a killed job replays only
incomplete partitions").

Scale design: the unit of resumability is the conv_id bucket — the same
key the input table is partitioned by (write_partitioned: ts_day ×
bucket(conv_id)), so each bucket job prunes its scan to its own files and
buckets never overlap. On a 1000-executor cluster you would raise
N_BUCKETS to a few thousand so stragglers re-run cheaply; locally 16
keeps job overhead negligible. `buckets=None` runs the whole input as a
single pass (fastest when resume granularity is not needed).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..functions import sharding
from ..operators.aggregate import conv_bucket_col
from ..operators.pack import assign_batches
from ..plans.pipeline import run_pipeline


def bucket_expr(n_buckets: int) -> F.Column:
    """Deterministic conversation bucket (engine-internal, xxhash-based).

    Unlike conv_bucket_col (oracle-friendly numeric-suffix bucket), the
    job runner buckets by hash so arbitrary conv_id shapes spread evenly.
    """
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets))


@dataclass
class JobResult:
    out_dir: str
    buckets_run: list[int]
    buckets_skipped: list[int]
    manifests: list[dict]


def _manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, "_manifests", f"bucket={bucket}.json")


def _write_manifest(out_dir: str, bucket: int, payload: dict) -> None:
    path = _manifest_path(out_dir, bucket)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.replace(tmp, path)  # atomic: a manifest exists only when complete


def completed_buckets(out_dir: str) -> set[int]:
    d = os.path.join(out_dir, "_manifests")
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("bucket=") and name.endswith(".json"):
            out.add(int(name[len("bucket="):-len(".json")]))
    return out


def _process(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    cfg: PipelineConfig,
    bucket: int | None,
    routes: DataFrame | None = None,
    shards: list[dict] | None = None,
) -> dict:
    """Run the pipeline over one bucket (or all) and write outputs.

    Single materialization discipline: the routed rows (with outcome,
    shard, batch assignment) are written ONCE, partitioned by sink; every
    aggregate is then derived from the written files — no stage of the
    lineage is computed twice.
    """
    res = run_pipeline(spark, transcripts, cfg, routes=routes, shards=shards)
    routed = sharding_safe_batches(res.routed, cfg)
    sub = f"bucket={bucket}" if bucket is not None else "all"

    routed_dir = os.path.join(out_dir, "routed", sub)
    (
        routed.withColumn("conv_bucket", conv_bucket_col(cfg.n_conv_buckets))
        .drop("parsed", "hash_key")  # wide derived cols stay out of the sink table
        .write.mode("overwrite")
        .partitionBy("sink")
        .parquet(routed_dir)
    )
    rejected_dir = os.path.join(out_dir, "rejected", sub)
    res.rejected.write.mode("overwrite").parquet(rejected_dir)

    # aggregates from the written table — ONE pruned scan (group cols +
    # crc only; parquet column pruning keeps text out) produces the
    # metric table, the outcome totals, and the lineage checksum.
    written = spark.read.parquet(routed_dir)
    sink_counts = written.groupBy(
        "sink", "conv_bucket", "role", "tool", "outcome"
    ).agg(
        F.count("*").alias("n"),
        F.sum(
            F.crc32(F.concat_ws("|", "conv_id", "turn_idx", "sink", "outcome"))
        ).alias("crc"),
    )
    rows = sink_counts.collect()
    metrics_dir = os.path.join(out_dir, "metrics", sub)
    spark.createDataFrame(rows, sink_counts.schema).write.mode("overwrite").parquet(
        metrics_dir
    )
    n_rejected = res.rejected.count()

    by_outcome: dict[str, int] = {}
    checksum = 0
    for r in rows:
        by_outcome[r["outcome"]] = by_outcome.get(r["outcome"], 0) + r["n"]
        checksum += r["crc"] or 0
    return {
        "bucket": bucket,
        "routed_rows": int(sum(by_outcome.values())),
        "by_outcome": by_outcome,
        "rejected_rows": int(n_rejected),
        "checksum": int(checksum or 0),
        "completed_at": time.time(),
    }


def sharding_safe_batches(routed: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Attach batch_no to accepted rows (NULL for dropped ones), packing
    only accepted bytes — single scan via the gated cumsum."""
    return assign_batches(routed, cfg, gate=F.col("outcome") == "accepted")


def run_job(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    cfg: PipelineConfig | None = None,
    n_buckets: int | None = 16,
    fail_after: int | None = None,
    routes: DataFrame | None = None,
    shards: list[dict] | None = None,
) -> JobResult:
    """Run (or resume) the full job. Buckets with a manifest are skipped.

    routes/shards override the default fixtures (e.g. loaded from the
    YAML service config). fail_after injects a crash after that many
    buckets (kill-replay tests).
    """
    cfg = cfg or PipelineConfig()
    manifests: list[dict] = []
    run: list[int] = []
    skipped: list[int] = []

    if n_buckets is None:
        if 0 in completed_buckets(out_dir):
            skipped.append(0)
        else:
            manifests.append(
                _process(spark, transcripts, out_dir, cfg, None, routes, shards)
            )
            _write_manifest(out_dir, 0, manifests[-1])
            run.append(0)
        return JobResult(out_dir, run, skipped, manifests)

    done = completed_buckets(out_dir)
    bucketed = transcripts.withColumn("_bucket", bucket_expr(n_buckets))
    for b in range(n_buckets):
        if b in done:
            skipped.append(b)
            continue
        if fail_after is not None and len(run) >= fail_after:
            raise RuntimeError(f"injected failure after {fail_after} buckets")
        part = bucketed.filter(F.col("_bucket") == b).drop("_bucket")
        m = _process(spark, part, out_dir, cfg, b, routes, shards)
        _write_manifest(out_dir, b, m)
        manifests.append(m)
        run.append(b)
    return JobResult(out_dir, run, skipped, manifests)


def read_all_manifests(out_dir: str) -> list[dict]:
    d = os.path.join(out_dir, "_manifests")
    out = []
    for b in sorted(completed_buckets(out_dir)):
        with open(os.path.join(d, f"bucket={b}.json")) as f:
            out.append(json.load(f))
    return out
