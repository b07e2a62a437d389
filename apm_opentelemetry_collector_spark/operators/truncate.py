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

from ..config import DROP_FATAL_ENCODING, OUTCOME_DROPPED, PipelineConfig

TRUNC_MARKER = "[TRUNCATED reason=max_span_size size="


def truncate_oversize(df: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """Adds `truncated` bool; rewrites oversized text; flags fatal drops.

    Output columns: text (possibly rewritten), truncated bool,
    encode_dropped bool, drop_reason (FatalEncodingError when dropped).
    """
    cfg = cfg or PipelineConfig()
    # One selectExpr instead of four withColumns (r7: each withColumn is a
    # full projection rebuild over py4j; the strings parse in one round
    # trip — run_pipeline constructs this per job submission). Semantics
    # unchanged: the rewritten row must FIT the cap — marker + first
    # `keep` bytes (reference re-encodes after truncation and checks the
    # size again, shard_encoder.go:254-266); keep < 0 → even the marker
    # alone is over the cap → irreducible → drop (ErrEncodingFailed
    # analog). Column order matches the withColumn form: originals with
    # text rewritten in place, then truncated / drop_reason / outcome.
    cap = int(cfg.max_span_size)
    marker = f"concat('{TRUNC_MARKER}', CAST(octet_length(text) AS STRING), '] ')"
    keep = f"CAST({cap} - octet_length({marker}) AS INT)"
    over = f"(octet_length(text) > {cap})"
    fatal = f"({over} AND {keep} < 0)"
    trunc = f"({over} AND NOT {fatal})"
    cols = [
        c
        if c != "text"
        else (
            f"CASE WHEN {trunc} THEN concat({marker}, "
            f"substring(text, 1, greatest({keep}, 0))) ELSE text END AS text"
        )
        for c in df.columns
    ]
    return df.selectExpr(
        *cols,
        f"{trunc} AS truncated",
        f"CASE WHEN {fatal} THEN '{DROP_FATAL_ENCODING}' "
        "ELSE CAST(NULL AS STRING) END AS drop_reason",
        f"CASE WHEN {fatal} THEN '{OUTCOME_DROPPED}' "
        "ELSE CAST(NULL AS STRING) END AS outcome",
    )
