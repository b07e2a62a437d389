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
