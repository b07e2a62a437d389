"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark at sf0.001 and its
oracle_sql() twin on DuckDB over the same parquet, then compares
row counts, sorted column names, and values (exact for non-floats; floats
must agree to 1e-12 relative — and the test reports the max divergence so
exactness regressions are visible).
"""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_TINY

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, (pd.Timestamp, dt.datetime)):
            return pd.Timestamp(v).isoformat()
        if hasattr(v, "item"):
            v = v.item()
        return v

    out = df.apply(lambda col: col.map(norm_cell))
    return out.sort_values(by=list(out.columns), na_position="first").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_TINY).toPandas()
    if name not in ORACLES:
        # rows-only contract (driver's weaker check): runs, stable schema
        assert len(sdf.columns) > 0
        assert len(sdf) >= 0
        return
    odf = duck.sql(ORACLES[name]).df()

    assert len(sdf) == len(odf), f"{name}: rowcount spark={len(sdf)} duck={len(odf)}"
    assert sorted(map(str.lower, sdf.columns)) == sorted(
        map(str.lower, odf.columns)
    ), f"{name}: columns differ: {sorted(sdf.columns)} vs {sorted(odf.columns)}"

    s = _normalize(sdf)
    o = _normalize(odf.rename(columns=dict(zip(odf.columns, map(str, odf.columns)))))
    o.columns = s.columns  # align case after sorting

    max_float_diff = 0.0
    for col in s.columns:
        sv, ov = s[col], o[col]
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a is None and b is None:
                continue
            if isinstance(a, float) or isinstance(b, float):
                assert a is not None and b is not None, f"{name}.{col}[{i}]: {a!r} vs {b!r}"
                diff = abs(a - b) / max(abs(a), abs(b), 1e-300)
                max_float_diff = max(max_float_diff, diff)
                assert diff < 1e-12, f"{name}.{col}[{i}]: {a!r} vs {b!r}"
            else:
                assert a == b, f"{name}.{col}[{i}]: {a!r} vs {b!r}"
    if max_float_diff:
        print(f"{name}: max relative float divergence {max_float_diff:.2e}")
