"""MinHash banding configurations: the production 128-hash/32-band
setting must run the same plan shape and achieve full recall against
brute-force ground truth on high-similarity near-dups (candidate
probability 1-(1-J^4)^32 ≈ 1 for J ≥ 0.7), with exact precision from the
Jaccard verify stage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apm_opentelemetry_collector_spark.operators.dedup import (
    CI_BANDING,
    PRODUCTION_BANDING,
    MinHashConfig,
    jaccard,
    minhash_lsh_dedup,
    shingles,
)

THRESHOLD = 0.5


def _corpus(spark):
    rows = []
    for i in range(8):
        toks = [f"tok{i}x{j}" for j in range(40)]
        rows.append((f"d{i:02d}a", " ".join(toks)))
        # near-dup: one token replaced (char-shingle jaccard ≈ 0.9)
        dup = list(toks)
        dup[7] = "REPLACED"
        rows.append((f"d{i:02d}b", " ".join(dup)))
    # unrelated documents
    for i in range(8):
        rows.append((f"u{i:02d}", " ".join(f"zq{i}w{j}" for j in range(40))))
    return spark.createDataFrame(rows, "doc_id string, text string")


def _ground_truth(spark, docs):
    ids = docs.select(F.col("doc_id").alias("id_a"))
    pairs = (
        ids.crossJoin(docs.select(F.col("doc_id").alias("id_b")))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    sh = shingles(docs)
    return {
        (r["id_a"], r["id_b"])
        for r in jaccard(pairs, sh).filter(F.col("jaccard") >= THRESHOLD).collect()
    }


def test_production_banding_full_recall(spark):
    docs = _corpus(spark)
    want = _ground_truth(spark, docs)
    assert len(want) == 8  # each base with exactly its near-dup

    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dedup(
            docs, THRESHOLD, cfg=PRODUCTION_BANDING
        ).collect()
    }
    # verify stage guarantees precision; 32 bands guarantee recall at J≈0.9
    assert got == want


def test_ci_banding_subset_of_truth(spark):
    docs = _corpus(spark)
    want = _ground_truth(spark, docs)
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dedup(docs, THRESHOLD, cfg=CI_BANDING).collect()
    }
    assert got <= want and got  # exact-verified: never a false positive


def test_banding_config_validates():
    with pytest.raises(ValueError):
        MinHashConfig(n_hashes=10, n_bands=4)
    assert PRODUCTION_BANDING.rows_per_band == 4


# --- hyperplane LSH ANN (scale path #2 beside IVF) ---------------------------
def test_lsh_knn_prunes_and_finds_close_neighbors(spark):
    from apm_opentelemetry_collector_spark.functions.vectors import brute_force_knn
    from apm_opentelemetry_collector_spark.operators.similarity import (
        hyperplane_lsh_knn,
        hyperplane_signs,
        lsh_bucket,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)

    # pruning: multi-probe candidates are a strict subset of all pairs
    planes = hyperplane_signs(8, 64)
    from apm_opentelemetry_collector_spark.functions.vectors import as_double
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        lsh_bucket(as_double("embedding"), planes).alias("bucket"),
    )
    probes = q.select(
        F.col("vec_id").alias("query_id"),
        lsh_bucket(as_double("embedding"), planes).alias("qb"),
    ).select(
        "query_id",
        F.explode(
            F.array(
                F.col("qb"), *[F.col("qb").bitwiseXOR(F.lit(1 << p)) for p in range(8)]
            )
        ).alias("bucket"),
    )
    n_candidates = probes.join(corpus, "bucket").count()
    n_all_pairs = q.count() * emb.count()
    assert 0 < n_candidates < n_all_pairs / 3  # genuinely pruned search

    # sanity vs exact search: LSH's top hit is a genuinely close neighbor —
    # its cosine is within the exact top-10 range for that query
    exact = {
        (r["query_id"], r["rank"]): r["cos"]
        for r in brute_force_knn(emb, q, k=10).collect()
    }
    for r in hyperplane_lsh_knn(emb, q, k=1).collect():
        floor_cos = exact[(r["query_id"], 10)]
        assert r["cos"] >= floor_cos, r


def test_distinct_scope_equality(spark):
    """The two shuffle plans (corpus-wide distinct vs candidate-scoped
    distinct with raw-shingle signatures) must produce IDENTICAL pairs —
    min over a multiset equals min over its set, and Jaccard only ever
    sees set-deduped candidate shingles."""
    docs = _corpus(spark)
    key = lambda df: {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in df.collect()
    }
    for base in (CI_BANDING, PRODUCTION_BANDING):
        a = minhash_lsh_dedup(
            docs, THRESHOLD,
            cfg=MinHashConfig(base.n_hashes, base.n_bands, base.est_min, "corpus"),
        )
        b = minhash_lsh_dedup(
            docs, THRESHOLD,
            cfg=MinHashConfig(base.n_hashes, base.n_bands, base.est_min, "candidates"),
        )
        assert key(a) == key(b) and len(key(a)) > 0


def test_distinct_scope_validates():
    with pytest.raises(ValueError, match="distinct_scope"):
        MinHashConfig(distinct_scope="nope")
