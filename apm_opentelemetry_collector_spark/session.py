"""SparkSession builder tuned for the transcript pipeline.

Local-mode settings follow the sandbox contract (local[N], single JVM);
cluster-scale intent is expressed through the same confs — AQE, adaptive
skew-join, shuffle-partition sizing — which carry over unchanged to a
multi-executor deployment.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "apm-otel-collector-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores defaults to $SPARK_GRAFT_CPUS (driver contract) else all cores.
    shuffle_partitions defaults to 2×cores — small enough for local mode,
    and AQE coalescing trims it further at runtime; on a real cluster this
    would be sized to ~2-3× total executor cores.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env) if env else 0  # 0 → local[*]
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = (cores * 2) if cores else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # let the planner pick shuffled-hash joins when the build side
        # fits (guide §3.1 / §9): skips both sort passes of sort-merge;
        # AQE still falls back / skew-splits, and partitions are sized
        # by the advisory target so per-task hash maps stay bounded
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        # shuffle blocks never cross a NIC in local mode and the scratch
        # disk outruns lz4 here (measured: ewma window shuffle 2.3 s →
        # 1.4 s), so compression is pure CPU overhead locally. On a
        # network-bound cluster set SPARK_GRAFT_SHUFFLE_COMPRESS=true
        # (and consider zstd) — the byte ratio dominates there.
        .config(
            "spark.shuffle.compress",
            os.environ.get("SPARK_GRAFT_SHUFFLE_COMPRESS", "false"),
        )
        .config(
            "spark.shuffle.spill.compress",
            os.environ.get("SPARK_GRAFT_SHUFFLE_COMPRESS", "false"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # parquet writer defaults — zstd is the file-level analog of the
        # reference's per-record gzip (shard_encoder.go:308-322)
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def ensure_checkpoint_dir(sc) -> None:
    """Point the context at a checkpoint dir if none is set.

    On a real cluster the caller sets durable shared storage; a scratch
    dir is the single-node stand-in, registered for removal at
    interpreter exit so repeated checkpointing operators in a long
    session don't leak files in /tmp (the ContextCleaner only removes
    them with cleanCheckpoints=true, a startup-only conf).
    """
    if sc.getCheckpointDir() is None:
        scratch = tempfile.mkdtemp(prefix="spark-ckpt-")
        atexit.register(shutil.rmtree, scratch, ignore_errors=True)
        sc.setCheckpointDir(scratch)


def spread_small_scan(df, min_parts: int | None = None):
    """Parallelize a few-split input (guide §2.5 "input skew": one huge
    unsplittable file — or here, one SMALL single-row-group parquet file
    — scans as a single task, so per-row-heavy downstream work like
    stride-1 window explodes, n-gram folds and signature hashing
    serializes on one core). If the scan plans fewer partitions than the
    session's default parallelism, round-robin repartition to spread it;
    an input that already has >= parallelism splits (any real-scale
    corpus) passes through UNCHANGED — the check makes this
    scale-adaptive, not a local-mode constant: at 100 TB the scan has
    thousands of splits and no extra exchange is ever added.

    Call it on the NARROW projection (id + the columns the operator
    needs), never the raw table, so the added exchange moves only the
    bytes the operator was going to shuffle anyway.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive: planning-only probe
        return df
    if n >= target:
        return df
    return df.repartition(target)


_PARQUET_SCHEMAS: dict[str, object] = {}


def read_input_table(spark: SparkSession, path: str):
    """spark.read.parquet with the inferred schema cached per path.

    Plain read.parquet infers the schema with a small driver job per
    call (~0.1-0.6 s + one job here); for the static input tables the
    schema never changes, so cache that METADATA — never data: every
    action still scans the parquet files — and pass it explicitly, which
    plans with no job. Intended for the fixed benchmark/test inputs
    only; outputs that are rewritten between reads must keep the
    inferring read.
    """
    sch = _PARQUET_SCHEMAS.get(path)
    if sch is None:
        df = spark.read.parquet(path)
        _PARQUET_SCHEMAS[path] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def assert_no_rowwise_python(df) -> None:
    """North-star audit: no per-row Python on the hot path.

    Raises if the physical plan contains BatchEvalPython (row-at-a-time
    Python UDF). ArrowEvalPython (pandas UDF) is allowed — that is the
    designated vectorized slow path for the parse stage.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "BatchEvalPython" in plan:
        raise AssertionError(
            "physical plan contains row-at-a-time Python UDF (BatchEvalPython):\n"
            + plan
        )
