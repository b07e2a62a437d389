"""Structured Streaming variant of the pipeline.

The reference is a continuous stream processor; the batch engine is the
primary deliverable (deterministic, oracle-checkable), but the streaming
re-expression demonstrates the Spark-native homes of its time/state
semantics (SURVEY.md §2.8):

  - T1 batch flush ticker (5 s)      → trigger(processingTime='5 seconds')
  - S3 node multiplexing             → applyInPandasWithState keyed by
    conv_id: the last non-null role/tool persists ACROSS micro-batches —
    the literal stream-scoped inheritance of octrace/opencensus.go:150-165
  - A1-A7 obsreport views            → windowed streaming aggregation
    with a watermark for late data
  - T6 retry/idempotence             → foreachBatch + idempotent writes
    (checkpointLocation gives exactly-once file sinks)

Stateless stages (parse, enrich, fan-out, outcome) are the SAME operator
functions as the batch plan — DataFrame transformations don't care which
engine runs them; that is the point of declaring the pipeline
relationally.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.transcripts import TRANSCRIPT_SCHEMA

FILLED_SCHEMA = T.StructType(
    list(TRANSCRIPT_SCHEMA.fields)
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_role", T.StringType()),
        T.StructField("last_tool", T.StringType()),
    ]
)


def stream_transcripts(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a transcript directory (schema pinned —
    no inference on the hot path)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _fill_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Stateful forward fill for one conversation across micro-batches.

    State = (last_role, last_tool) seen so far on this conversation's
    stream — exactly the receiver's per-stream Node/Resource memory
    (octrace/opencensus.go:150-165).
    """
    last_role, last_tool = state.get if state.exists else (None, None)
    for pdf in pdfs:
        pdf = pdf.sort_values("turn_idx")
        fills = {}
        for col, last in (("role", last_role), ("tool", last_tool)):
            # vectorized last-non-null: pandas ffill within the chunk,
            # seeded by the cross-batch state for leading nulls
            s = pdf[col].ffill()
            if last is not None:
                s = s.fillna(last)
            fills[col] = s
        if len(pdf):
            if pd.notna(fills["role"].iloc[-1]):
                last_role = fills["role"].iloc[-1]
            if pd.notna(fills["tool"].iloc[-1]):
                last_tool = fills["tool"].iloc[-1]
        pdf = pdf.assign(**fills)
        yield pdf[[f.name for f in FILLED_SCHEMA.fields]]
    state.update((last_role, last_tool))


def forward_fill_stateful(stream: DataFrame) -> DataFrame:
    """Node-multiplexing forward fill with cross-micro-batch state."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        _fill_group,
        FILLED_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def windowed_sink_counts(
    routed: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming obsreport view: per-sink outcome counts in event-time
    windows, late rows beyond the watermark dropped (T5)."""
    return (
        routed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "sink", "outcome")
        .agg(F.count("*").alias("n"))
    )


def dedup_stream(
    stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once turn delivery under at-least-once ingest: drop
    duplicate (conv_id, turn_idx) rows across micro-batches, keeping
    state only within the watermark horizon (bounded state — the
    streaming twin of the batch engine's exact dedup).

    The reference tolerates duplicate sends (at-least-once with retries,
    exporter.go:194-235); a consumer that needs exactly-once semantics
    dedups at ingest, which is this operator.
    """
    keys = keys or ["conv_id", "turn_idx"]
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def sessionize_session_window(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = None
) -> DataFrame:
    """T5: gap-based sessionization in its idiomatic Spark home —
    F.session_window — usable on both batch and streaming DataFrames.

    Semantics twin of the batch lag+cumsum (q_events_sessionize):
    identical sessions whenever no two consecutive events are EXACTLY
    `gap` apart — session_window's interval is half-open (an event at
    last_ts + gap starts a new session) while the batch rule's
    `gap > G` breaker merges it. With microsecond timestamps the
    boundary case has measure zero; the equality is asserted on real
    data in tests/test_streaming.py.

    Output: user_id, session_start, session_end, n_events — session_no
    is an ordinal only the batch cumsum can assign (streaming sessions
    emit unordered); join on (user_id, session_start) to correlate.
    """
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .drop("session_window")
    )


ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("mean", T.DoubleType()),
        T.StructField("var", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def ewma_anomalies(
    stream: DataFrame,
    alpha: float = 0.3,
    k: float = 3.0,
    min_points: int = 5,
) -> DataFrame:
    """Stateful streaming anomaly detection per host: exponentially
    weighted mean/variance carried ACROSS micro-batches; a point whose
    z-score exceeds k (after a min_points warm-up) is flagged BEFORE it
    updates the state, so a spike cannot mask itself.

    This is the custom-stateful-operator case Spark has no Column home
    for (sequential state per key): applyInPandasWithState with numeric
    state, the numeric sibling of the forward-fill's string state.
    Expects columns (host, ts, value).
    """

    def detect(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        mean, var, n = state.get if state.exists else (0.0, 0.0, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            zs, flags = [], []
            for x in pdf["value"].astype(float):
                if n >= min_points and var > 0:
                    z = (x - mean) / (var ** 0.5)
                else:
                    z = 0.0
                flag = bool(abs(z) > k)
                zs.append(z)
                flags.append(flag)
                if n == 0:
                    mean, var = x, 0.0
                else:
                    d = x - mean
                    mean += alpha * d
                    var = (1 - alpha) * (var + alpha * d * d)
                n += 1
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "ts": pdf["ts"],
                    "value": pdf["value"].astype(float),
                    "zscore": zs,
                    "is_anomaly": flags,
                }
            )
        state.update((float(mean), float(var), int(n)))

    return stream.groupBy("host").applyInPandasWithState(
        detect,
        ANOMALY_SCHEMA,
        EWMA_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


COUNTER_DELTA_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("delta", T.DoubleType()),
    ]
)

COUNTER_STATE_SCHEMA = T.StructType([T.StructField("last_value", T.DoubleType())])


def counter_delta_stateful(stream: DataFrame) -> DataFrame:
    """Streaming twin of operators/rates.counter_delta: cumulative →
    delta with reset handling, per (name, host) series, the LAST value
    carried ACROSS micro-batches — the batch operator's lag window
    becomes one float of keyed state. Inside a batch the differencing
    is vectorized (pandas shift), seeded by the state for the first
    row; first point of a series ever → NULL delta (no baseline),
    decrease → reset → delta = the post-reset value itself.
    Expects columns (name, host, ts, value).
    """

    def diff(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        last = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            import numpy as np

            vals = pdf["value"].astype(float)
            prev = vals.shift(1)
            if last is not None and len(pdf):
                prev.iloc[0] = last
            # no baseline → NULL (nullable Float64, masked — NOT NaN: the
            # batch twin emits NULL and downstream `delta IS NULL` filters
            # and sum/avg must behave identically on both paths); decrease
            # → reset → the value itself
            delta = pd.array(
                np.where(vals.values >= prev.values, vals.values - prev.values, vals.values),
                dtype="Float64",
            )
            delta[prev.isna().to_numpy()] = pd.NA
            delta = pd.Series(delta, index=vals.index)
            out = pd.DataFrame(
                {
                    "name": pdf["name"],
                    "host": pdf["host"],
                    "ts": pdf["ts"],
                    "value": vals,
                    "delta": delta,
                }
            )
            if len(pdf):
                last = float(vals.iloc[-1])
            yield out
        if last is not None:
            state.update((last,))

    return stream.groupBy("name", "host").applyInPandasWithState(
        diff,
        COUNTER_DELTA_SCHEMA,
        COUNTER_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


FUNNEL_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("step_idx", T.IntegerType()),
        T.StructField("step", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("step_reached", T.IntegerType()),
        T.StructField("last_us", T.LongType()),  # completion ts, epoch µs
    ]
)


def funnel_stateful(
    stream: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Streaming twin of analytics.funnel_stages: per-user funnel
    progress as keyed state (furthest step + its completion time in
    epoch µs) across micro-batches; one row emitted per ADVANCE.

    Equivalent to the batch operator when each user's events arrive in
    event-time order (the greedy first-qualifying advance equals the
    batch min-ts chain) — the usual ordered-ingest assumption; under
    reordering, pair with a watermark-sized buffer upstream.
    Expects columns (user_id, event_type, ts).
    """

    def advance(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        reached, last_us = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            out = []
            for etype, ts in zip(pdf["event_type"], pdf["ts"]):
                if reached >= len(steps):
                    break
                ts_us = int(pd.Timestamp(ts).value // 1000)
                needed = steps[reached]
                if etype == needed and (reached == 0 or ts_us > last_us):
                    reached += 1
                    last_us = ts_us
                    out.append((int(key[0]), reached, needed, ts))
            if out:
                yield pd.DataFrame(out, columns=["user_id", "step_idx", "step", "ts"])
        state.update((int(reached), int(last_us)))

    return stream.groupBy("user_id").applyInPandasWithState(
        advance,
        FUNNEL_EVENT_SCHEMA,
        FUNNEL_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def write_sinks_stream(
    routed: DataFrame, out_dir: str, checkpoint_dir: str
):
    """Exactly-once streaming sink: foreachBatch writing per-sink parquet.

    The reference guarantees at-least-once with retries + drop codes
    (exporter.go:194-290); Structured Streaming's checkpoint + foreachBatch
    upgrades that to exactly-once for file sinks: a micro-batch replayed
    after a crash rewrites the same epoch deterministically (idempotent
    overwrite by epoch directory). This is the streaming twin of the
    batch job's manifest-gated buckets (plans/job.py).
    """

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        (
            df.write.mode("overwrite")
            .partitionBy("sink")
            .parquet(f"{out_dir}/epoch={epoch_id}")
        )

    return (
        routed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def write_sinks_stream_merge(
    routed: DataFrame, table: str, checkpoint_dir: str
):
    """Streaming sink upgraded to MERGE semantics: each micro-batch
    upserts into an Iceberg table on the routed-row identity key, so a
    replayed epoch is idempotent at the ROW level (not just the epoch
    directory level of write_sinks_stream). Iceberg runtime required —
    gated like the rest of sources/iceberg.py; the parquet epoch sink
    remains the fallback."""
    from ..sources.iceberg import iceberg_available, merge_resume

    spark = routed.sparkSession
    if not iceberg_available(spark):
        raise RuntimeError(
            "MERGE streaming sink requires the Iceberg runtime; use "
            "write_sinks_stream (epoch-idempotent parquet) instead"
        )

    def merge_batch(df: DataFrame, epoch_id: int) -> None:
        merge_resume(spark, table, df, view_name=f"_epoch_{epoch_id}")

    return (
        routed.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drive a streaming DataFrame to completion into a memory sink
    (synchronous — for tests and smoke checks)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()
