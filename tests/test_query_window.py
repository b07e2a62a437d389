"""Driver-coverage window invariant.

The driver verifies the FIRST 50 queries() entries (r1: 44/44 checked,
r2: exactly the first 50 of 62). Every query that has never had a
driver CORRECTNESS row — plus anything whose implementation changed
this round — must sit inside that window, and everything past the
cutoff must already hold an r2 hash-MATCH row. This test freezes the
invariant so a careless reorder can't silently un-verify a query.
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as entrymod

R2 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  "CORRECTNESS_r02.json")

MUST_BE_IN_WINDOW = {
    # never driver-checked before r3
    "embedding_neardup", "ivf_knn", "lsh_knn", "stratified_sample",
    "cms_user_counts", "alert_sustained_utilization", "counter_rate",
    "hll_distinct_users", "bloom_membership", "contamination_cross_source",
    "record_encode_stats", "multimodal_features",
    # new in r3
    "ann_recall", "tune_n_probe", "weighted_reservoir", "kmeans_assign",
    "tfidf_top_terms", "tdigest_value_quantiles", "dedup_components",
    "leakage_safe_split", "robust_outliers", "video_frame_sample",
    "events_funnel", "cohort_retention", "events_json_props",
    "rate_limit_exceeded",
    # implementation touched in r3 (distinct_scope)
    "minhash_lsh_neardup",
}


def test_window_covers_unverified_queries():
    names = list(entrymod.queries())
    window = set(names[:50])
    assert MUST_BE_IN_WINDOW <= window, MUST_BE_IN_WINDOW - window

    with open(R2) as f:
        r2 = json.load(f)
    for name in names[50:]:
        row = r2.get(name)
        assert row is not None, f"{name} past the cutoff with no r2 row"
        assert row["rows_match"] and row["schema_match"] and row["hash_match"], name


def test_every_query_has_oracle_or_documented_exception():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    rows_only = {"record_encode_stats", "tdigest_value_quantiles"}
    missing = set(qs) - set(oracles) - rows_only
    assert not missing, missing
    assert set(oracles) <= set(qs)
