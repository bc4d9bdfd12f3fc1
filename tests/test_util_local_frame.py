"""local_frame: LocalRelation-backed driver-side frames.

The contract under test: for int/bool/str/None rows, local_frame
returns exactly the rows createDataFrame would (same schema, same
values, null-for-null), while its plan is a LocalRelation — zero
python-RDD scan tasks on every collect/broadcast. Anything outside
the exact-round-trip envelope must fall back to createDataFrame
unchanged.
"""

from __future__ import annotations

from aistore_spark.util import local_frame

SCHEMA = "a int, b string, c bigint"


def _plan_class(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().getClass().getSimpleName()


def _rows(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_local_frame_matches_create_dataframe(spark):
    rows = [
        (1, "plain", 10),
        (2, "qu'ote and back\\slash", -5),
        (3, "uniécode 中", 1 << 40),
        (4, None, None),
        (None, "line\nbreak\ttab", 0),
    ]
    lf = local_frame(spark, rows, SCHEMA)
    cd = spark.createDataFrame(rows, schema=SCHEMA)
    assert lf.schema == cd.schema
    assert _rows(lf) == _rows(cd)
    assert _plan_class(lf) == "LocalRelation"
    assert _plan_class(cd) != "LocalRelation"


def test_local_frame_all_null_column_types_correctly(spark):
    lf = local_frame(spark, [(1, None, None), (2, None, None)], SCHEMA)
    assert [f.dataType.simpleString() for f in lf.schema.fields] == [
        "int",
        "string",
        "bigint",
    ]
    assert _plan_class(lf) == "LocalRelation"


def test_local_frame_bool_column(spark):
    lf = local_frame(spark, [(True,), (False,), (None,)], "flag boolean")
    assert _rows(lf) == [(False,), (True,), (None,)]
    assert _plan_class(lf) == "LocalRelation"


def test_local_frame_falls_back_outside_envelope(spark):
    # floats cannot round-trip as literals here -> createDataFrame path
    f = local_frame(spark, [(1.5, "x", 1)], "a double, b string, c bigint")
    assert _plan_class(f) != "LocalRelation"
    assert _rows(f) == [(1.5, "x", 1)]
    # numpy scalars are not exact-typed python ints -> fallback, which
    # preserves createDataFrame's own type error for them
    import numpy as np
    import pytest
    from pyspark.errors.exceptions.base import PySparkTypeError

    with pytest.raises(PySparkTypeError):
        local_frame(spark, [(np.int64(7),)], "a bigint")
    # NUL byte cannot ride in a SQL literal -> fallback
    f3 = local_frame(spark, [("a\x00b",)], "s string")
    assert _rows(f3) == [("a\x00b",)]
    # empty list -> fallback (VALUES needs a row)
    f4 = local_frame(spark, [], "a int, b string")
    assert f4.count() == 0 and len(f4.schema.fields) == 2
