"""Pin the driver-testdata schemas the engine is written against.

The round-3 outage started exactly here: regenerated testdata silently
changed ``events.ts`` from int64 nanos to parquet TIMESTAMP(MICROS) and
every ``ts``-arithmetic query broke at analysis time. A drifted fixture
should fail THIS test in seconds, naming the table and column, instead
of surfacing as AnalysisExceptions scattered through the suite.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from aistore_spark.sources.tables import TABLES, load_table

EXPECTED_PARQUET = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp[us]",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp[us]",
    },
    "events": {
        "event_id": "int64",
        "ts": "timestamp[us]",
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}


@pytest.mark.parametrize("table", TABLES)
def test_parquet_footer_schema(sf_dir, table):
    schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
    got = {f.name: str(f.type) for f in schema}
    assert got == EXPECTED_PARQUET[table], (
        f"{table}.parquet schema drifted — update EXPECTED_PARQUET *and* "
        "audit every query touching the changed columns"
    )


def test_spark_side_event_ts_is_ntz(spark, sf_dir):
    # the type the whole ts-arithmetic path (util.ntz_micros_sql) assumes
    ev = load_table(spark, sf_dir, "events")
    assert ev.schema["ts"].dataType.typeName() == "timestamp_ntz"


def test_driver_heap_auto_sizing_arithmetic(tmp_path):
    """Heap auto-sizing guard (verdict-r10 #7): SCALE.md's measured
    facts — 8 GiB OOMs at sf10 (1.2 GiB parquet), 64 GiB completes,
    96 GiB + 32 workers kernel-OOMs the host — encoded as code, so the
    big tiers run green with no hand-set heap and the known-bad zone
    is refused, not discovered hours in."""
    import pytest

    from aistore_spark.session import auto_driver_mem, heap_cap_gib

    # cap: 128 GiB host, 32 workers -> 128 - 60.8 = 67g (96g is refused
    # territory, 64g fits)
    assert heap_cap_gib(32, host_gib=128) == 67
    assert heap_cap_gib(8, host_gib=128) == 112  # floor 16 GiB headroom

    # no sf_dir / tiny tier -> the historical 8g default
    assert auto_driver_mem(None, 32, host_gib=128) == "8g"
    small = tmp_path / "sf_small"
    small.mkdir()
    (small / "t.parquet").write_bytes(b"x" * 1024)
    assert auto_driver_mem(str(small), 32, host_gib=128) == "8g"

    # sf10-sized dir (1.2 GiB) -> 64g, inside the cap
    big = tmp_path / "sf_big"
    big.mkdir()
    with (big / "t.parquet").open("wb") as f:
        f.truncate(int(1.2 * 2**30))
    assert auto_driver_mem(str(big), 32, host_gib=128) == "64g"

    # a dir that would WANT more than the cap is clamped to it
    huge = tmp_path / "sf_huge"
    huge.mkdir()
    with (huge / "t.parquet").open("wb") as f:
        f.truncate(4 * 2**30)
    assert auto_driver_mem(str(huge), 32, host_gib=128) == "67g"

    # explicit env in the measured kernel-OOM zone is REFUSED
    import os

    from aistore_spark.session import get_spark

    os.environ["SPARK_DRIVER_MEM"] = "999g"
    try:
        with pytest.raises(ValueError, match="safe cap"):
            get_spark("refuse_test", cpus=32)
    finally:
        del os.environ["SPARK_DRIVER_MEM"]
