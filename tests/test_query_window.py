"""Driver-coverage window invariant.

The driver verifies the FIRST 50 queries() entries (r1: 44/44 checked,
r2/r3: exactly the first 50). After r3 every query has been
driver-checked at least once (r2 ∪ r3 union), so the standing policy is
newest/touched-first: anything new or implementation-touched this round
must sit inside that window, and everything past the cutoff must
already hold a hash-MATCH row in an earlier round's CORRECTNESS json.
This test freezes the invariant so a careless reorder can't silently
un-verify a query.
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as entrymod

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EARLIER_ROUNDS = [
    os.path.join(_ROOT, f"CORRECTNESS_r{i:02d}.json") for i in (2, 3, 4, 5)
]

MUST_BE_IN_WINDOW = {
    # new or implementation-touched in r6: span_cores is the
    # containment-support query; repeated_spans gained the (default-off)
    # counting-bucket prefilter and re-verifies under the same hash;
    # ivfpq_knn is the new IVFADC operator and pq_knn's training/encode
    # internals were refactored into the helpers it shares with it
    "span_cores",
    "repeated_spans",
    "ivfpq_knn",
    "semdedup",
    "pq_knn",
    # late-r6 additions
    "pack_sequences",
    "mixture_weights",
    "dedup_canonical",
    "gopher_quality_filters",
    "gopher_repetition",
    "ngram_decontaminate",
    "decontaminate_splice",
    "c4_line_filters",
    "c4_span_dedup",
    "dsir_weights",
    "ccnet_buckets",
    "exactsubstr_dedup",
    "curation_funnel",
    "trigram_lm_scores",
    "temperature_mixture",
    "tokenizer_fertility",
    "fineweb_filters",
    "url_dedup",
}


def test_window_covers_unverified_queries():
    names = list(entrymod.queries())
    window = set(names[:50])
    assert MUST_BE_IN_WINDOW <= window, MUST_BE_IN_WINDOW - window

    earlier = {}
    for path in EARLIER_ROUNDS:
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                    earlier[name] = row
    for name in names[50:]:
        assert name in earlier, f"{name} past the cutoff with no earlier hash-MATCH row"


def test_every_query_has_oracle_or_documented_exception():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    rows_only = {
        "record_encode_stats",
        "tdigest_value_quantiles",
        "value_percentiles_tdigest",
    }
    missing = set(qs) - set(oracles) - rows_only
    assert not missing, missing
    assert set(oracles) <= set(qs)
