#!/usr/bin/env python
"""spark-submit entry point for the training-data CURATION stack.

Runs the published cleaning pipeline end-to-end over a documents table
and materializes its outputs (the batch twin of what curation_funnel
reports):

    stage 1  C4 line filters (Raffel et al. 2020 §2.2) — line rewrite +
             doc keep;
    stage 2  Gopher quality rules (Rae et al. 2021 App. A1.1) scored on
             the cleaned text;
    stage 3  exact keep-first dedup on the cleaned text's normalized
             md5 fingerprint;
    stage 4  (optional, --exactsubstr) ExactSubstr removal (Lee et al.
             2022) rewriting the survivors.

Outputs under --output:
    cleaned/    parquet of surviving docs (doc_id, source, lang,
                cleaned_text, n_tokens)
    funnel/     parquet of the per-source survival funnel
    _summary.json  driver-side totals (bounded: one row per source)

Production launch (north_rule: "ships as spark-submit --py-files"):

    zip -r pipeline.zip apm_opentelemetry_collector_spark
    spark-submit --py-files pipeline.zip scripts/curate_job.py \
        --input  s3://bucket/documents/            \
        --output s3://bucket/curated/run-2024-06-01/

Local smoke:

    python scripts/curate_job.py --input /root/testdata/sf0.001 \
        --output /tmp/curated
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="documents table path (dir with documents.parquet, or a parquet path)")
    ap.add_argument("--output", required=True, help="output root")
    ap.add_argument("--exactsubstr", action="store_true",
                    help="also run ExactSubstr removal over the survivors")
    ap.add_argument("--demo-lined", action="store_true",
                    help="apply the synthetic-corpus lining shim (the "
                    "driver-query construction) — the sf* testdata is "
                    "single-line token soup that C4's line rules would "
                    "drop outright; real corpora don't need this")
    args = ap.parse_args()

    from apm_opentelemetry_collector_spark.functions import text as textfn
    from apm_opentelemetry_collector_spark.functions.text import (
        fingerprint,
        token_count,
    )
    from apm_opentelemetry_collector_spark.operators.dedup import (
        exactsubstr_dedup,
    )

    # under spark-submit a session already exists; standalone runs build one
    spark = SparkSession.builder.appName("curate-job").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    path = args.input
    if os.path.isdir(path) and os.path.exists(
        os.path.join(path, "documents.parquet")
    ):
        path = os.path.join(path, "documents.parquet")
    docs = spark.read.parquet(path)
    if args.demo_lined:
        from apm_opentelemetry_collector_spark.operators.curation import (
            curation_lined,
        )

        lang = docs.select("doc_id", "lang")
        docs = curation_lined(docs).join(lang, "doc_id")

    c4 = textfn.c4_line_filters(
        docs, id_cols=("doc_id", "source", "lang")
    ).withColumnRenamed("keep", "keep_c4")
    gq = textfn.gopher_quality(
        c4,
        text_col="cleaned_text",
        id_cols=("doc_id", "source", "lang", "keep_c4", "cleaned_text"),
    )
    scored = gq.select(
        "doc_id",
        "source",
        "lang",
        "cleaned_text",
        "keep_c4",
        (F.col("keep_c4") & F.col("keep")).alias("keep_both"),
        fingerprint("cleaned_text").alias("fp"),
        token_count("cleaned_text").cast("bigint").alias("n_tokens"),
    )
    surv = scored.filter("keep_both")
    # keep-first winner per exact-dup class (curation_funnel semantics)
    winner_ids = surv.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = surv.join(winner_ids, ["fp", "doc_id"], "left_semi")

    if args.exactsubstr:
        # only docs that actually LOST a duplicated span are swapped to
        # the operator's rewrite (which lives in the normalized domain —
        # lowercased, whitespace-collapsed); untouched docs keep their
        # original-cased multi-line C4-cleaned text
        rewritten = exactsubstr_dedup(kept, text_col="cleaned_text")
        kept = (
            kept.join(
                rewritten.select(
                    "doc_id",
                    F.col("cleaned_text").alias("_rw"),
                    "changed",
                ),
                "doc_id",
            )
            .withColumn(
                "cleaned_text",
                F.when(F.col("changed"), F.col("_rw")).otherwise(
                    F.col("cleaned_text")
                ),
            )
            .drop("_rw", "changed")
            .withColumn("n_tokens", token_count("cleaned_text").cast("bigint"))
        )

    out_docs = kept.select(
        "doc_id", "source", "lang", "cleaned_text", "n_tokens"
    )
    out_docs.write.mode("overwrite").parquet(
        os.path.join(args.output, "cleaned")
    )

    # funnel from the WRITTEN table plus the pre-dedup stage counts —
    # derived without recomputing the pipeline lineage for the summary
    written = spark.read.parquet(os.path.join(args.output, "cleaned"))
    stages = scored.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_raw"),
        F.sum(F.col("keep_c4").cast("bigint")).cast("bigint").alias("n_after_c4"),
        F.sum(F.col("keep_both").cast("bigint")).cast("bigint").alias("n_after_gopher"),
    )
    final = written.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_final"),
        F.sum("n_tokens").cast("bigint").alias("tokens_final"),
    )
    zero = F.lit(0).cast("bigint")
    funnel = stages.join(final, "source", "left").select(
        "source",
        "n_raw",
        "n_after_c4",
        "n_after_gopher",
        F.coalesce("n_final", zero).alias("n_final"),
        F.coalesce("tokens_final", zero).alias("tokens_final"),
    )
    funnel.write.mode("overwrite").parquet(os.path.join(args.output, "funnel"))

    # bounded driver collect: one row per source (strata-bounded)
    rows = spark.read.parquet(os.path.join(args.output, "funnel")).collect()
    summary = {
        "sources": {r["source"]: {k: r[k] for k in r.asDict() if k != "source"}
                    for r in rows},
        "totals": {
            k: int(sum(r[k] for r in rows))
            for k in ("n_raw", "n_after_c4", "n_after_gopher", "n_final",
                      "tokens_final")
        },
        "exactsubstr": bool(args.exactsubstr),
    }
    blob = json.dumps(summary, indent=2, sort_keys=True)
    # the summary must land on the OUTPUT filesystem, which under
    # spark-submit is usually s3/hdfs — a plain open() only works for
    # local paths, so write through Spark (works for any scheme) and
    # add the local _summary.json convenience copy when the path is one
    spark.createDataFrame([(blob,)], "value string").coalesce(1).write.mode(
        "overwrite"
    ).text(os.path.join(args.output, "summary_json"))
    if "://" not in args.output:
        with open(os.path.join(args.output, "_summary.json"), "w") as f:
            f.write(blob)
    print(json.dumps(summary["totals"]))


if __name__ == "__main__":
    main()
