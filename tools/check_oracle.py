"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
set, and the full (order-insensitive) value multiset. Exact equality —
the driver hashes values, so "close" is not good enough.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aistore_spark.session import get_spark
from aistore_spark.sources.tables import TABLES


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        rows.append(
            tuple(
                None
                if v is None or (isinstance(v, float) and pd.isna(v))
                else (pd.Timestamp(v).to_pydatetime() if isinstance(v, pd.Timestamp) else v)
                for v in tup
            )
        )
    rows.sort(key=repr)
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    spark = get_spark("check_oracle", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failed = []
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failed.append(name)
            continue
        osql = oracles.get(name)
        if osql is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.sql(osql).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failed.append(name)
            continue
        dt = time.time() - t0
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL  {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            failed.append(name)
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rows {len(sdf)} vs {len(odf)}")
            failed.append(name)
            continue
        a, b = canon(sdf), canon(odf)
        if a != b:
            bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
            print(f"FAIL  {name}: values differ at sorted-row {bad}:")
            print(f"      spark : {a[bad]}")
            print(f"      duckdb: {b[bad]}")
            failed.append(name)
            continue
        print(f"ok    {name}: {len(sdf)} rows  cols={list(sorted(sdf.columns))} ({dt:.1f}s)")

    print(f"\n{len(qs) - len(failed)}/{len(qs)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
