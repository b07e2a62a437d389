#!/usr/bin/env python
"""Streaming-mode throughput: the same pipeline operators under
Structured Streaming (file source → validate → fill(stateful) → route →
outcome → foreachBatch parquet sink with checkpointing).

Prints one JSON line: rows, seconds, rows/sec, micro-batches. The batch
engine's numbers live in bench.py / BENCH/BASELINE.md §3; this measures
the micro-batch overhead path (state store, checkpoint commits, epoch
writes) — expect lower throughput than batch, that is the cost of
per-batch exactly-once.

Usage: python scripts/stream_bench.py [rows] [files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apm_opentelemetry_collector_spark.operators.route import (  # noqa: E402
    fan_out,
    with_send_outcome,
)
from apm_opentelemetry_collector_spark.session import get_spark  # noqa: E402
from apm_opentelemetry_collector_spark.sources import fixtures  # noqa: E402
from apm_opentelemetry_collector_spark.sources.transcripts import (  # noqa: E402
    synth_transcripts,
)
from apm_opentelemetry_collector_spark.streaming.stream_pipeline import (  # noqa: E402
    forward_fill_stateful,
    stream_transcripts,
)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    spark = get_spark("stream-bench", cores=CPUS, shuffle_partitions=CPUS)
    work = tempfile.mkdtemp(prefix="stream_bench_")
    inp = os.path.join(work, "in")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    try:
        (
            synth_transcripts(spark, n_rows=rows, n_convs=max(rows // 100, 1))
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(inp)
        )
        routes = fixtures.routes_df(spark)
        stream = stream_transcripts(spark, inp, max_files_per_trigger=1)
        routed = with_send_outcome(
            fan_out(forward_fill_stateful(stream), routes)
        ).select("sink", "conv_id", "turn_idx", "outcome")

        n_batches = 0

        def write_batch(df, epoch_id):
            nonlocal n_batches
            n_batches += 1
            df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

        t0 = time.time()
        q = (
            routed.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        elapsed = time.time() - t0
        written = spark.read.parquet(out).count()
        print(
            json.dumps(
                {
                    "metric": "stream_pipeline_rows_per_sec",
                    "input_rows": rows,
                    "routed_rows_written": written,
                    "sec": round(elapsed, 2),
                    "rows_per_sec": round(rows / elapsed, 1),
                    "micro_batches": n_batches,
                    "cores": CPUS,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
