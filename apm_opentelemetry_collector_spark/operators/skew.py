"""Skew-defusing salted join.

When one join key holds a disproportionate share of the big side, a
plain shuffle join lands that key's rows in ONE task. AQE's skew-join
splits oversized partitions after the fact; this operator is the
explicit, deterministic form for when you know the skew up front (the
reference's hot-conversation case): salt the big side into n_salts
sub-keys and replicate the small side once per salt, so the hot key
spreads over n_salts tasks.

Cost model: small side is materialized n_salts×, big side is not
duplicated — the right trade whenever |small| × n_salts ≪ |big|'s hot
share. Result equality with the plain join is exact (tested); salts are
derived from a caller-named unique column, never rand(), so replays are
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join big⨝small on `on`, spreading each key over n_salts tasks.

    salt_from: a column of `big` whose hash varies within a key (e.g.
    turn_idx, event_id) — the salt source; deterministic across replays.

    how is restricted to {inner, left, left_semi}: those are exactly the
    modes where replicating the small side is equivalence-preserving.
    For right/full outer, an unmatched small-side key would surface once
    per salt replica (n_salts null-extended rows instead of one).
    """
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "semi"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}) is not equivalence-preserving: the "
            "replicated small side would emit unmatched rows once per salt. "
            "Use inner/left/left_semi, or a plain join for outer modes."
        )
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )
    return big_s.join(small_s, [*on, "_salt"], how).drop("_salt")
