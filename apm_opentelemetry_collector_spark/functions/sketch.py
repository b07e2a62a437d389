"""Count-min sketch — frequency estimation as a DataFrame composition.

The sketch that lets a 100 TB pipeline answer "how often does key k
appear" in O(width × depth) memory instead of one cell per distinct key:
depth D hash rows, each hashing every key into one of W buckets and
counting; the estimate for k is the MIN over its D bucket counts (always
an overestimate, never an under-estimate).

Spark-first: building the sketch is `explode(D hash structs)` →
`groupBy(row, bucket).count()` — map-side combinable, bounded state
(W×D cells), one shuffle regardless of key cardinality. Probing is a
broadcast join of the probe keys' (row, bucket) pairs against the
sketch, then `min(count)` per key. Hashing is md5-derived so a SQL
oracle reproduces the sketch bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WIDTH = 64
DEPTH = 4

# bucket(d, key) = first 4 hex chars of md5("<d>:<key>") mod WIDTH —
# rendered identically into the Spark plan and the SQL oracle.
_BUCKET_SPARK = (
    lambda d, key, width: F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{d}:"), key.cast("string")).cast("binary")), 1, 4),
        16,
        10,
    ).cast("bigint")
    % width
)


def bucket_sql(d: int, key_sql: str, width: int = WIDTH) -> str:
    md5 = f"md5('{d}:' || CAST({key_sql} AS VARCHAR))"
    nib = lambda i: f"(instr('0123456789abcdef', substr({md5}, {i}, 1)) - 1)"
    return f"(({nib(1)} * 4096 + {nib(2)} * 256 + {nib(3)} * 16 + {nib(4)}) % {width})"


def cms_build(
    df: DataFrame, key_col: str, width: int = WIDTH, depth: int = DEPTH
) -> DataFrame:
    """Sketch table: (row, bucket, n) — at most width×depth rows."""
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("row"),
                _BUCKET_SPARK(d, key, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    width: int = WIDTH,
    depth: int = DEPTH,
) -> DataFrame:
    """Point estimates for probe keys: min over the D bucket counts.

    The sketch is tiny (≤ width×depth rows) — broadcast it; probing is
    a map-side join however many probe keys arrive.
    """
    key = F.col(key_col)
    pairs = probes.select(
        key.alias("_key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        _BUCKET_SPARK(d, key, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select("_key", F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    return (
        pairs.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .na.fill({"n": 0})
        .groupBy(F.col("_key").alias(key_col))
        .agg(F.min("n").alias("est_n"))
    )


# --- HyperLogLog-style distinct sketch ---------------------------------------
#
# m = 256 buckets from the first md5 byte; rank = leading-zero bits of
# the remaining 120 bits + 1, found with a portable regexp + nibble CASE.
# All per-bucket terms 2^-M are exact powers of two with realistic ranks
# ≤ ~30, so the harmonic sum is order-independent and bit-identical in
# Spark and DuckDB; ln() (small-range correction) is the one libm call,
# neutralized by rounding the estimate to 4 decimals on both sides.

HLL_M = 256
HLL_ALPHA_M2 = 0.7213 / (1 + 1.079 / HLL_M) * HLL_M * HLL_M  # inlined literal
HLL_ALLZERO_RANK = 121  # 120 zero bits + 1 (md5 tail exhausted)


def _hll_rank_spark(key):
    hx = F.md5(key.cast("string").cast("binary"))
    bucket = F.conv(F.substring(hx, 1, 2), 16, 10).cast("bigint")
    tail = F.substring(hx, 3, 30)
    z = F.length(F.regexp_extract(tail, "^(0*)", 1))
    nz = F.substring(tail, (z + 1).cast("int"), 1)
    v = F.instr(F.lit("0123456789abcdef"), nz) - 1
    czn = (
        F.when(v >= 8, 0).when(v >= 4, 1).when(v >= 2, 2).otherwise(3)
    )
    rank = F.when(z >= 30, F.lit(HLL_ALLZERO_RANK)).otherwise(4 * z + czn + 1)
    return bucket, rank


def hll_distinct(df: DataFrame, key_col: str, group_cols: list[str]) -> DataFrame:
    """Approximate distinct count of key_col per group, HLL estimator
    with linear-counting small-range correction. Output: group_cols +
    est_distinct (double, rounded to 4 decimals)."""
    bucket, rank = _hll_rank_spark(F.col(key_col))
    per_bucket = (
        df.select(*group_cols, bucket.alias("_b"), rank.alias("_r"))
        .groupBy(*group_cols, "_b")
        .agg(F.max("_r").alias("_m"))
    )
    agg = per_bucket.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("_m"))).alias("_s"),
        F.count("*").alias("_present"),
    )
    m = F.lit(HLL_M).cast("double")
    v_zero = m - F.col("_present")
    s_full = F.col("_s") + v_zero  # absent buckets contribute 2^0 = 1
    est_raw = F.lit(HLL_ALPHA_M2) / s_full
    est = F.when(
        (est_raw <= 2.5 * m) & (v_zero > 0), m * F.log(m / v_zero)
    ).otherwise(est_raw)
    return agg.select(*group_cols, F.round(est, 4).alias("est_distinct"))


def hll_sql(key_sql: str, group_col: str, table: str = "events") -> str:
    """Oracle twin of hll_distinct — same constants, same arithmetic."""
    hx = f"md5(CAST({key_sql} AS VARCHAR))"
    nib = lambda i: f"(instr('0123456789abcdef', substr({hx}, {i}, 1)) - 1)"
    tail = f"substr({hx}, 3, 30)"
    z = f"length(regexp_extract({tail}, '^(0*)', 1))"
    nzv = f"(instr('0123456789abcdef', substr({tail}, {z} + 1, 1)) - 1)"
    est_raw = f"({HLL_ALPHA_M2!r} / (s + ({HLL_M}.0 - present)))"
    return f"""
WITH r AS (
  SELECT {group_col},
         {nib(1)} * 16 + {nib(2)} AS b,
         CASE WHEN {z} >= 30 THEN {HLL_ALLZERO_RANK}
              ELSE 4 * {z}
                   + (CASE WHEN {nzv} >= 8 THEN 0
                           WHEN {nzv} >= 4 THEN 1
                           WHEN {nzv} >= 2 THEN 2
                           ELSE 3 END) + 1
         END AS rank
  FROM {table}
), per_bucket AS (
  SELECT {group_col}, b, max(rank) AS m FROM r GROUP BY {group_col}, b
), agg AS (
  SELECT {group_col}, sum(pow(2.0, -m)) AS s, count(*) AS present
  FROM per_bucket GROUP BY {group_col}
)
SELECT {group_col}, round(
  CASE WHEN {est_raw} <= 2.5 * {HLL_M}.0 AND ({HLL_M}.0 - present) > 0
       THEN {HLL_M}.0 * ln({HLL_M}.0 / ({HLL_M}.0 - present))
       ELSE {est_raw} END, 4) AS est_distinct
FROM agg"""


# --- Bloom filter -------------------------------------------------------------
#
# Membership sketch: k md5-derived bit positions per key over an m-bit
# space; a probe key "maybe" belongs when ALL its bits are set (false
# positives possible, false negatives impossible). Build = explode k
# positions → distinct (bounded ≤ m rows); probe = broadcast join + a
# bits-hit count. Deterministic hashing → the oracle reproduces the
# filter bit for bit, INCLUDING its false positives.

BLOOM_M = 4096  # bits
BLOOM_K = 4     # hash functions


def _bloom_bit_spark(d: int, key, m: int):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"b{d}:"), key.cast("string")).cast("binary")),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % m
    )


def bloom_bit_sql(d: int, key_sql: str, m: int = BLOOM_M) -> str:
    md5 = f"md5('b{d}:' || CAST({key_sql} AS VARCHAR))"
    nib = lambda i: f"(instr('0123456789abcdef', substr({md5}, {i}, 1)) - 1)"
    return f"(({nib(1)} * 4096 + {nib(2)} * 256 + {nib(3)} * 16 + {nib(4)}) % {m})"


def bloom_build(
    df: DataFrame, key_col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """Set-bit table: one row per set bit (≤ m rows)."""
    key = F.col(key_col)
    bits = F.array(*[_bloom_bit_spark(d, key, m) for d in range(k)])
    return df.select(F.explode(bits).alias("bit")).distinct()


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """maybe_member = all k bits set. Output: key_col, maybe_member."""
    key = F.col(key_col)
    pairs = probes.select(
        key.alias("_key"),
        F.explode(
            F.array(*[_bloom_bit_spark(d, key, m) for d in range(k)])
        ).alias("bit"),
    )
    hits = (
        pairs.join(F.broadcast(bloom), "bit", "left_semi")
        .groupBy("_key")
        .agg(F.count("*").alias("_hits"))
    )
    return (
        probes.select(key.alias("_key"))
        .distinct()
        .join(hits, "_key", "left")
        .na.fill({"_hits": 0})
        .select(
            F.col("_key").alias(key_col),
            (F.col("_hits") >= k).alias("maybe_member"),
        )
    )
