"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
set, and the full (order-insensitive) value multiset. Exact equality —
the driver hashes values, so "close" is not good enough.

Usage: python tools/check_oracle.py [--json OUT.json] [--materialize]
         [--oracle-timeout SECS] [--skip name:reason]...
         [--duckdb-mem 40GB] [sf_dir] [query ...]

``--json`` writes a driver-ledger-shaped artifact (per-query
rows/schema/hash flags) covering EVERY registered query — the driver's
own ledger caps at the first 50, so this file is the hard correctness
signal for the rest.

sf1-scale options (verdict-r6 item 2):
``--materialize`` pre-creates every catalog derivation (objects,
members, ...) as a DuckDB temp table and strips the per-oracle catalog
CTEs (AISTORE_ORACLE_MATERIALIZED), so ~100 oracles share one catalog
materialization instead of re-deriving it each.
``--oracle-timeout`` interrupts any single DuckDB oracle after SECS
seconds and records the row as a reasoned skip instead of hanging the
gate. ``--skip name:reason`` records a known-infeasible oracle (e.g.
dd7's recursive closure >66 GB at sf1) without attempting it.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aistore_spark.session import get_spark
from aistore_spark.sources.tables import TABLES
from aistore_spark.util import release_cached


def _scalar(v):
    # The driver's canonicalizer (sort_values -> Categorical) requires
    # hashable scalars; a LIST/ndarray cell (e.g. DuckDB map extraction
    # without [1]) crashes it. Raise here so local-green implies
    # driver-green — the r6 s2c incident.
    if isinstance(v, (list, tuple, dict, set, bytearray)) or type(v).__module__ == "numpy" and getattr(v, "ndim", 0) > 0:
        raise TypeError(f"non-scalar cell {type(v).__name__}: {v!r}")
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    return v


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        rows.append(tuple(_scalar(v) for v in tup))
    rows.sort(key=repr)
    return rows


def _guard_scalars(df: pd.DataFrame) -> None:
    """Vectorized form of the _scalar cell rejection for big frames."""
    bad = (list, tuple, dict, set, bytearray)
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            mask = col.map(
                lambda v: isinstance(v, bad)
                or (type(v).__module__ == "numpy" and getattr(v, "ndim", 0) > 0)
            )
            if mask.any():
                raise TypeError(f"non-scalar cell in column {c!r}")


# Above this row count the per-row Python canon becomes the gate's
# bottleneck (measured: 1M rows ≈ 15 min repr-sort at sf1); the
# vectorized path is the same exact order-insensitive multiset compare
# (stable lexicographic sort on every column, then DataFrame.equals —
# NaN == NaN, dtype equality already enforced upstream).
_VECTOR_COMPARE_ROWS = 50_000


def frames_equal(sdf: pd.DataFrame, odf: pd.DataFrame) -> bool:
    cols = sorted(sdf.columns)
    if len(sdf) > _VECTOR_COMPARE_ROWS:
        a, b = sdf[cols], odf[cols]
        _guard_scalars(a)
        _guard_scalars(b)
        a = a.sort_values(cols, kind="mergesort", na_position="last").reset_index(drop=True)
        b = b.sort_values(cols, kind="mergesort", na_position="last").reset_index(drop=True)
        return a.equals(b)
    return canon(sdf) == canon(odf)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    materialize = False
    oracle_timeout = None
    duckdb_mem = None
    skips: dict[str, str] = {}
    while argv and argv[0].startswith("--"):
        if argv[0] == "--json":
            json_out = argv[1]
            argv = argv[2:]
        elif argv[0] == "--materialize":
            materialize = True
            argv = argv[1:]
        elif argv[0] == "--oracle-timeout":
            oracle_timeout = float(argv[1])
            argv = argv[2:]
        elif argv[0] == "--skip":
            name, _, reason = argv[1].partition(":")
            skips[name] = reason or "skipped"
            argv = argv[2:]
        elif argv[0] == "--duckdb-mem":
            duckdb_mem = argv[1]
            argv = argv[2:]
        else:
            raise SystemExit(f"unknown option {argv[0]}")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = argv[1:]  # keep caller order (cost order for the sf1 gate)

    if materialize:
        # must happen BEFORE the oracle strings are built at import
        assert "aistore_spark.benchqueries" not in sys.modules
        os.environ["AISTORE_ORACLE_MATERIALIZED"] = "1"

    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only:
        missing = [n for n in only if n not in qs]
        if missing:
            raise SystemExit(f"unknown queries: {missing}")
        qs = {k: qs[k] for k in only}

    spark = get_spark(
        "check_oracle",
        cpus=int(os.environ.get("CHECK_ORACLE_CPUS", "8")),
        sf_dir=sf_dir,
    )
    con = duckdb.connect()
    if duckdb_mem:
        # --duckdb-mem 40GB: pin DuckDB's budget and give it a spill
        # directory. Default DuckDB sizes itself at ~80% of host RAM
        # and does NOT see the Spark JVM squatting on the other half —
        # at sf10 that overcommit killed the g1c/g2 oracles with
        # host-memory OOM. A pinned limit + temp_directory turns the
        # same oracles into out-of-core runs instead of aborts.
        spill = Path("/tmp/duckdb_spill")
        spill.mkdir(exist_ok=True)
        con.sql(f"SET memory_limit='{duckdb_mem}'")
        con.sql(f"SET temp_directory='{spill}'")
        # cap the spill (r13: ann5b's twin wrote 65 GB of temp and
        # filled the root disk, killing every LATER oracle with IO
        # errors — a capped run fails alone, with a measured number)
        spill_cap = os.environ.get("CHECK_ORACLE_SPILL_CAP", "50GB")
        con.sql(f"SET max_temp_directory_size='{spill_cap}'")
        con.sql("SET preserve_insertion_order=false")
    for t in TABLES:
        # partial fixtures exist (the bench-only sf100 tier omits
        # events — no scale-law row reads it); a missing table only
        # matters if a requested oracle references it, which then
        # fails with a clear error on its own row
        if not Path(f"{sf_dir}/{t}.parquet").exists():
            print(f"note: {sf_dir}/{t}.parquet absent — view skipped")
            continue
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    if materialize:
        from aistore_spark.oracles import _CATALOGS

        for name, sql in _CATALOGS.items():
            t0 = time.time()
            con.sql(f"CREATE TABLE {name} AS {sql}")
            n = con.sql(f"SELECT count(*) FROM {name}").fetchone()[0]
            print(f"materialized {name}: {n} rows ({time.time() - t0:.1f}s)")

    def run_oracle(osql: str) -> pd.DataFrame:
        """Run one oracle, interrupting it after --oracle-timeout."""
        if oracle_timeout is None:
            return con.sql(osql).df()
        timer = threading.Timer(oracle_timeout, con.interrupt)
        timer.start()
        try:
            return con.sql(osql).df()
        finally:
            timer.cancel()

    ledger: dict[str, dict] = {}
    failed = []

    def flush_ledger() -> None:
        # incremental: at the big scale tiers a wall-clock cutoff can
        # kill the run mid-sweep — every completed row must survive
        if json_out:
            Path(json_out).write_text(json.dumps(ledger, indent=2) + "\n")

    ordered = list(qs.items()) if only else sorted(qs.items())
    for name, fn in ordered:
        flush_ledger()
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        ledger[name] = rec
        if name in skips:
            rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = None
            rec["err"] = f"skipped: {skips[name]}"
            print(f"skip  {name}: {skips[name]}")
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            rec["err"] = f"spark: {exc}"[:300]
            failed.append(name)
            continue
        finally:
            # queries pin frames (m9 warmed catalog, shingle subtrees);
            # release per query like bench.py, or they leak across the run
            release_cached()
        rec["spark_rows"] = len(sdf)
        osql = oracles.get(name)
        if osql is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            # rows-only by declared design (e.g. j4 xxhash64 placement):
            # null flags = not-applicable, NOT a failed comparison
            rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = None
            rec["err"] = "no oracle (rows-only by design)"
            continue
        try:
            odf = run_oracle(osql)
        except duckdb.InterruptException:
            rec["rows_match"] = rec["schema_match"] = rec["hash_match"] = None
            rec["err"] = (
                f"skipped: oracle exceeded {oracle_timeout:.0f}s at this SF "
                "(DuckDB single-node twin cost, not a Spark failure)"
            )
            print(f"skip  {name}: oracle timeout {oracle_timeout:.0f}s")
            continue
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            rec["err"] = f"duckdb: {exc}"[:300]
            failed.append(name)
            continue
        dt = time.time() - t0
        rec["oracle_rows"] = len(odf)
        rec["rows_match"] = len(sdf) == len(odf)
        rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
        if not rec["schema_match"]:
            print(f"FAIL  {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            # err must be truthy on every failure path or the sf10 merge
            # (tools/merge_sf10.py) classifies the row as neither green,
            # skip, nor failure — a silent hole in the hard signal
            rec["err"] = f"schema: {sorted(sdf.columns)} vs {sorted(odf.columns)}"[:300]
            failed.append(name)
            continue
        # The driver hashes raw values, so pandas dtype drift (DuckDB
        # HUGEINT sums -> float64 vs Spark int64: 123.0 vs 123) is a
        # hash mismatch even when values compare equal in Python.
        dt_bad = [
            (c, str(sdf[c].dtype), str(odf[c].dtype))
            for c in sorted(sdf.columns)
            if str(sdf[c].dtype) != str(odf[c].dtype)
        ]
        if dt_bad:
            print(f"FAIL  {name}: dtype mismatch (spark vs duckdb): {dt_bad}")
            rec["err"] = f"dtype: {dt_bad}"[:300]
            failed.append(name)
            continue
        if not rec["rows_match"]:
            print(f"FAIL  {name}: rows {len(sdf)} vs {len(odf)}")
            rec["err"] = f"rows: {len(sdf)} vs {len(odf)}"
            failed.append(name)
            continue
        try:
            same = frames_equal(sdf, odf)
        except TypeError as exc:
            print(f"FAIL  {name}: non-scalar cell would crash the driver canonicalizer: {exc}")
            rec["err"] = f"non-scalar: {exc}"[:300]
            failed.append(name)
            continue
        if not same:
            if len(sdf) <= _VECTOR_COMPARE_ROWS:
                a, b = canon(sdf), canon(odf)
                bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
                print(f"FAIL  {name}: values differ at sorted-row {bad}:")
                print(f"      spark : {a[bad]}")
                print(f"      duckdb: {b[bad]}")
            else:
                print(f"FAIL  {name}: value multiset differs (vectorized compare)")
            rec["err"] = "value mismatch"
            failed.append(name)
            continue
        rec["hash_match"] = True
        print(f"ok    {name}: {len(sdf)} rows  cols={list(sorted(sdf.columns))} ({dt:.1f}s)")

    flush_ledger()
    print(f"\n{len(qs) - len(failed)}/{len(qs)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
