"""XL-span truncation — oversized-payload handling.

Reference (exporter/omnishard/shard_encoder.go:231-272, defaults
factory.go:35, goldens encoder_test.go:243-319): a span whose encoded size
exceeds MaxAllowedSizePerSpan has its Tags replaced by three marker tags
(omnition.truncated / .reason / .size) and Logs cleared, then is
re-encoded; if STILL too big (the irreducible part — operation name — is
oversized) it is dropped with ErrEncodingFailed → FatalEncodingError.

Transcript analog: `text` is the payload. Oversized text is truncated to
a marker + prefix; if even the irreducible row (empty text) would exceed
the cap — modeled as the cap being smaller than the marker — the row is
dropped. Pure Column expressions; `octet_length` is the size probe (the
reference's double-marshal size probe, fixed by construction —
SURVEY.md §4 'double-marshal inefficiency').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DROP_FATAL_ENCODING, OUTCOME_DROPPED, PipelineConfig

TRUNC_MARKER = "[TRUNCATED reason=max_span_size size="


def truncate_oversize(df: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """Adds `truncated` bool; rewrites oversized text; flags fatal drops.

    Output columns: text (possibly rewritten), truncated bool,
    encode_dropped bool, drop_reason (FatalEncodingError when dropped).
    """
    cfg = cfg or PipelineConfig()
    size = F.octet_length("text")
    marker = F.concat(F.lit(TRUNC_MARKER), size.cast("string"), F.lit("] "))
    # the rewritten row must FIT the cap: marker + first `keep` bytes
    # (reference re-encodes after truncation and checks the size again,
    # shard_encoder.go:254-266). keep < 0 → even the marker alone is over
    # the cap → irreducible → drop (ErrEncodingFailed analog).
    keep = (F.lit(cfg.max_span_size) - F.octet_length(marker)).cast("int")
    over = size > cfg.max_span_size
    fatal = over & (keep < 0)
    return (
        df.withColumn("truncated", over & ~fatal)
        .withColumn(
            "text",
            F.when(
                over & ~fatal,
                F.concat(
                    marker,
                    F.substring(F.col("text"), F.lit(1), F.greatest(keep, F.lit(0))),
                ),
            ).otherwise(F.col("text")),
        )
        .withColumn(
            "drop_reason",
            F.when(fatal, F.lit(DROP_FATAL_ENCODING)).otherwise(F.lit(None).cast("string")),
        )
        .withColumn(
            "outcome",
            F.when(fatal, F.lit(OUTCOME_DROPPED)).otherwise(F.lit(None).cast("string")),
        )
    )
