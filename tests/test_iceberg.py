"""Iceberg storage layer: capability detection and the parquet fallback
(the sandbox ships no Iceberg jars — every Iceberg-only call must gate
cleanly and the fallback must produce the pruning-equivalent layout)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apm_opentelemetry_collector_spark.sources.iceberg import (
    iceberg_available,
    iceberg_bucket_slice,
    is_table_identifier,
    merge_resume,
    merge_resume_sql,
    read_transcripts,
    write_transcripts,
)
from apm_opentelemetry_collector_spark.sources.transcripts import synth_transcripts


def test_detection_is_honest(spark):
    # this environment has no Iceberg runtime; detection must say so
    # (on a cluster with iceberg-spark-runtime on the classpath it
    # flips to True and write_transcripts switches engines)
    assert iceberg_available(spark) is False


def test_table_identifier_heuristic():
    assert is_table_identifier("local.db.transcripts")
    assert not is_table_identifier("/data/transcripts")
    assert not is_table_identifier("file:/data/transcripts")


def test_fallback_writes_prunable_layout(spark, tmp_path):
    df = synth_transcripts(spark, 2000, 40)
    path = str(tmp_path / "t")
    assert write_transcripts(spark, df, path, n_buckets=4) == "parquet"
    back = read_transcripts(spark, path)
    assert back.count() == 2000
    pruned = back.filter(F.col("conv_bucket") == 1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and pruned.count() > 0


def test_iceberg_only_paths_gate_cleanly(spark):
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        iceberg_bucket_slice(spark, "local.db.t", 0, 16)
    with pytest.raises(RuntimeError, match="MERGE INTO requires"):
        merge_resume(spark, "local.db.t", synth_transcripts(spark, 10, 2))


def test_merge_sql_shape():
    sql = merge_resume_sql("local.db.routed", "_updates")
    assert sql.startswith("MERGE INTO local.db.routed t")
    # idempotence key = routed-row identity
    for frag in ("t.conv_id = s.conv_id", "t.turn_idx = s.turn_idx",
                 "t.sink = s.sink", "WHEN MATCHED THEN UPDATE SET *",
                 "WHEN NOT MATCHED THEN INSERT *"):
        assert frag in sql


def test_streaming_merge_sink_gates_cleanly(spark):
    from apm_opentelemetry_collector_spark.streaming.stream_pipeline import (
        write_sinks_stream_merge,
    )

    df = synth_transcripts(spark, 10, 2)
    with pytest.raises(RuntimeError, match="MERGE streaming sink requires"):
        write_sinks_stream_merge(df, "local.db.routed", "/tmp/nope")
