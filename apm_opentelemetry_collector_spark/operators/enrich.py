"""Broadcast lookup enrichment — resource/attributes/k8s processor analog.

Reference: the attributes processor adds/updates span attributes and the
k8s/resource processors attach environment metadata looked up by key
(cmd/omnitelsvc/components.go:89-95). Spark-first: a broadcast LEFT join
against a small dimension table keyed (role, tool) — no shuffle of the
fact side, dimension shipped once per executor (SURVEY.md §2.4 J7).

Rows without a dimension match keep NULL service metadata (the dim table
deliberately omits one combination — FIXTURES.md §2) and get
service_name coalesced to 'unknown', mirroring the Process-backfill
coalesce pattern (exporter/omnishard/exporter.go:184-188, P2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(turns: DataFrame, service_dim: DataFrame) -> DataFrame:
    out = turns.join(F.broadcast(service_dim), on=["role", "tool"], how="left")
    return out.withColumn(
        "service_name", F.coalesce(F.col("service_name"), F.lit("unknown"))
    ).withColumn(
        "resource_type", F.coalesce(F.col("resource_type"), F.lit("unknown"))
    )
