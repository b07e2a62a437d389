"""Exactly-once streaming sink: checkpointed foreachBatch replays a
micro-batch after a crash without duplicating rows (T6 idempotence,
the streaming twin of the batch manifests)."""

from __future__ import annotations

import pytest

# streaming restart/slicing suites dominate the full gate (~16 min);
# the fast per-change loop skips them: pytest -m "not slow"
pytestmark = pytest.mark.slow

import datetime as dt

from pyspark.sql import Row

from apm_opentelemetry_collector_spark.operators.route import fan_out, with_send_outcome
from apm_opentelemetry_collector_spark.sources import fixtures
from apm_opentelemetry_collector_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from apm_opentelemetry_collector_spark.streaming.stream_pipeline import (
    stream_transcripts,
    write_sinks_stream,
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        [
            Row(conv_id=c, turn_idx=i, role="user", text=f"t{i}", tool="search",
                ts=dt.datetime(2024, 1, 1))
            for c, i in rows
        ],
        TRANSCRIPT_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(path)


def test_exactly_once_across_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    routes = fixtures.routes_df(spark)

    def routed_stream():
        return with_send_outcome(fan_out(stream_transcripts(spark, src), routes))

    _write_batch(spark, src, [("c1", 0), ("c1", 1)])
    q = write_sinks_stream(routed_stream(), out, ckpt)
    q.processAllAvailable()
    q.stop()  # 'crash' after epoch 0 committed

    # new data arrives while down; restart from the same checkpoint
    _write_batch(spark, src, [("c2", 0), ("c2", 1), ("c2", 2)])
    q2 = write_sinks_stream(routed_stream(), out, ckpt)
    q2.processAllAvailable()
    q2.stop()

    got = spark.read.parquet(out).select("sink", "conv_id", "turn_idx")
    rows = [(r["sink"], r["conv_id"], r["turn_idx"]) for r in got.collect()]
    # every routed row exactly once — the restart neither lost epoch-0
    # rows nor reprocessed them into duplicates
    assert len(rows) == len(set(rows))
    want = {
        (r["sink"], r["conv_id"], r["turn_idx"])
        for r in with_send_outcome(
            fan_out(spark.read.schema(TRANSCRIPT_SCHEMA).parquet(src), routes)
        ).collect()
    }
    assert set(rows) == want


def test_dedup_state_survives_checkpoint_restart(spark, tmp_path):
    """A restarted query (same checkpoint) must still drop duplicates
    first seen BEFORE the restart — dedup state lives in the checkpoint,
    not the process."""
    import datetime as dt

    from pyspark.sql import Row

    from apm_opentelemetry_collector_spark.sources.transcripts import (
        TRANSCRIPT_SCHEMA,
    )
    from apm_opentelemetry_collector_spark.streaming.stream_pipeline import (
        dedup_stream,
        stream_transcripts,
    )

    in_path = str(tmp_path / "in")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ts = dt.datetime(2024, 1, 1)

    def write(rows):
        spark.createDataFrame(
            [Row(conv_id=c, turn_idx=i, role="user", text=t, tool=None, ts=ts)
             for c, i, t in rows],
            TRANSCRIPT_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(in_path)

    def run_once():
        q = (
            dedup_stream(stream_transcripts(spark, in_path))
            .select("conv_id", "turn_idx", "text")
            .writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    write([("c1", 0, "a"), ("c1", 1, "b")])
    run_once()
    # after restart: turn 0 re-delivered (must be dropped via restored
    # state) plus a genuinely new turn
    write([("c1", 0, "a"), ("c1", 2, "c")])
    run_once()

    got = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in spark.read.parquet(out_path).collect()
    )
    assert got == [("c1", 0, "a"), ("c1", 1, "b"), ("c1", 2, "c")]


def test_counter_state_survives_checkpoint_restart(spark, tmp_path):
    """A restarted counter-delta query (same checkpoint) must difference
    against the last value seen BEFORE the restart — the per-series
    float lives in the state store, not the process."""
    import datetime as dt

    from pyspark.sql import Row
    from pyspark.sql import types as T

    from apm_opentelemetry_collector_spark.streaming.stream_pipeline import (
        counter_delta_stateful,
    )

    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("host", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    in_path = str(tmp_path / "in")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

    def write(rows):
        spark.createDataFrame(
            [Row(name="m", host="h", ts=t(s), value=float(v)) for s, v in rows],
            schema,
        ).coalesce(1).write.mode("append").parquet(in_path)

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_path)
        )
        q = (
            counter_delta_stateful(stream)
            .writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    write([(0, 10), (1, 25)])
    run_once()
    # process "restarts"; next point must difference against 25 (state),
    # and a reset mid-file must still yield the post-reset value
    write([(2, 40), (3, 4)])
    run_once()

    got = {r["ts"]: r["delta"] for r in spark.read.parquet(out_path).collect()}
    assert got[t(1)] == 15.0
    assert got[t(2)] == 15.0  # 40 - 25: baseline restored from checkpoint
    assert got[t(3)] == 4.0   # reset
    assert got[t(0)] is None or got[t(0)] != got[t(0)]  # first point: NULL/NaN
