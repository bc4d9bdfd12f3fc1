"""The retired digest-stub multimodal plumbing contracts (verdict r5
item 8): mm1-mm4 no longer occupy oracle slots — every stage has a
real-codec registered row (mm5-mm10, mm2b/3b/4b, t9) — but the
no-codec Arrow/UDF pipelines (schema, batching, determinism) stay
value-checked here against the same DuckDB oracles they used to run
under in queries()."""

from __future__ import annotations

import duckdb
import pytest

from aistore_spark.benchqueries import (
    STUB_PLUMBING_ORACLES,
    STUB_PLUMBING_QUERIES,
)
from aistore_spark.sources.tables import TABLES


def _canon(df):
    df = df[sorted(df.columns)]
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    rows.sort(key=repr)
    return rows


@pytest.fixture(scope="module")
def ducksf(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_stub_ledger_names_are_stable():
    assert sorted(STUB_PLUMBING_QUERIES) == [
        "mm1_decode_media",
        "mm2_resize",
        "mm3_feature_extract",
        "mm4_frame_sample",
    ]
    assert set(STUB_PLUMBING_ORACLES) == set(STUB_PLUMBING_QUERIES)


@pytest.mark.parametrize("name", sorted(STUB_PLUMBING_QUERIES))
def test_stub_plumbing_matches_oracle(spark, sf_dir, ducksf, name):
    got = STUB_PLUMBING_QUERIES[name](spark, sf_dir).toPandas()
    exp = ducksf.sql(STUB_PLUMBING_ORACLES[name]).df()
    assert sorted(got.columns) == sorted(exp.columns)
    assert _canon(got) == _canon(exp)
