"""The catalog derivations (catalog.py) and their DuckDB mirrors
(oracles.py) must produce identical tables — this is the foundation
every oracle check stands on, so drift fails loudly here."""

from __future__ import annotations

import pandas as pd
import pytest

from aistore_spark import catalog, oracles
from aistore_spark.sources.tables import load_table

CASES = [
    ("objects", "documents", catalog.objects_catalog),
    ("remote_objects", "documents", catalog.remote_objects_catalog),
    ("members", "lineitem", catalog.members_catalog),
    ("batch_requests", "events", catalog.batch_requests),
]


def _norm(v):
    # map columns: Spark→dict, DuckDB→{'key': [...], 'value': [...]};
    # normalize both to sorted pairs. (This is also why no oracle-checked
    # QUERY returns a raw map column — the driver's hash would see
    # different shapes; queries project map entries instead.)
    if isinstance(v, dict):
        if set(v.keys()) == {"key", "value"} and isinstance(v["key"], (list, tuple)):
            return sorted(zip(v["key"], v["value"]))
        return sorted(v.items())
    return v


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [
        tuple(_norm(v) for v in tup)
        for tup in df.itertuples(index=False, name=None)
    ]
    rows.sort(key=repr)
    return rows


@pytest.mark.parametrize("name,table,builder", CASES, ids=[c[0] for c in CASES])
def test_catalog_matches_oracle_cte(name, table, builder, spark, oracle, sf_dir):
    sdf = builder(load_table(spark, sf_dir, table)).toPandas()
    odf = oracle.sql(oracles._CATALOGS[name]).df()  # noqa: SLF001
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    assert canon(sdf) == canon(odf)


def test_ekm_table_matches(spark, oracle):
    sdf = catalog.ekm_table(spark).toPandas()
    odf = oracle.sql(oracles.EKM_SQL).df()
    assert canon(sdf) == canon(odf)
