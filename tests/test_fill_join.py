"""forward_fill_join must agree EXACTLY with the window forward_fill —
including leading nulls, anchor-free bucket gaps, and the hot-conversation
fixture — while partitioning work by (conv, turn-bucket)."""

from __future__ import annotations

from pyspark.sql import Row

from apm_opentelemetry_collector_spark.operators.forward_fill import (
    forward_fill,
    forward_fill_join,
)
from apm_opentelemetry_collector_spark.sources.transcripts import synth_transcripts


def _cmp(spark, df, bucket_size):
    a = forward_fill(df).select("conv_id", "turn_idx", "role", "tool")
    b = forward_fill_join(df, bucket_size=bucket_size).select(
        "conv_id", "turn_idx", "role", "tool"
    )
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0, f"{diff} differing rows (bucket_size={bucket_size})"
    assert a.count() == b.count() == df.count()


def test_matches_window_on_synth(spark):
    df = synth_transcripts(spark, n_rows=20_000, n_convs=100)
    _cmp(spark, df, bucket_size=64)


def test_matches_window_on_hot_conversation(spark):
    df = synth_transcripts(spark, n_rows=20_000, n_convs=50, hot_conv_fraction=0.5)
    _cmp(spark, df, bucket_size=32)


def test_gap_and_leading_null_semantics(spark):
    rows = (
        # leading nulls stay null; anchor at 5; long null run crossing
        # several anchor-free buckets; second anchor much later
        [("c", i, None, "t", None) for i in range(0, 5)]
        + [("c", 5, "node1", "t", "search")]
        + [("c", i, None, "t", None) for i in range(6, 40)]
        + [("c", 40, "node2", "t", None)]
        + [("c", i, None, "t", None) for i in range(41, 50)]
    )
    df = spark.createDataFrame(
        [Row(conv_id=c, turn_idx=i, role=r, text=t, tool=o, ts=None) for c, i, r, t, o in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    _cmp(spark, df, bucket_size=4)  # tiny buckets → many anchor-free gaps
    got = {
        r["turn_idx"]: (r["role"], r["tool"])
        for r in forward_fill_join(df, bucket_size=4).collect()
    }
    assert got[0] == (None, None)                 # leading nulls preserved
    assert got[39] == ("node1", "search")         # carried across gap buckets
    assert got[49] == ("node2", "search")         # tool survives role anchor
