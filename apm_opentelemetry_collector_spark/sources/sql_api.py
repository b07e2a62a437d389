"""SQL API surface — temp views over the testdata tables + pipeline.

The engine is declared with the DataFrame API, which means every
operator is equally reachable from `spark.sql(...)`: register_views
exposes the raw tables, the derived transcripts, and the routed
pipeline output as temp views so an analyst can drive the whole thing
from SQL (the north_star names "DataFrame / SQL" as the query surface).
Views are lazy — registering costs nothing until a query runs, and
Catalyst optimizes SQL and DataFrame plans identically.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def register_views(
    spark: SparkSession, sf_dir: str, include_pipeline: bool = True
) -> list[str]:
    """Register temp views: the ten parquet tables, `transcripts`
    (frozen events→transcripts derivation), and — when
    include_pipeline — `routed` (parse→enrich→route→outcome output).
    Returns the view names registered."""
    from ..config import PipelineConfig
    from ..plans.pipeline import run_pipeline
    from .transcripts import derive_transcripts

    from ..operators.tdigest import register_digest_sql

    names = []
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
        names.append(t)
    tr = derive_transcripts(spark, sf_dir)
    tr.createOrReplaceTempView("transcripts")
    names.append("transcripts")
    if include_pipeline:
        res = run_pipeline(spark, tr, PipelineConfig())
        res.routed.createOrReplaceTempView("routed")
        res.rejected.createOrReplaceTempView("rejected")
        names += ["routed", "rejected"]
    # digest aggregates: approximate quantiles composable from pure SQL
    names += register_digest_sql(spark)
    return names
