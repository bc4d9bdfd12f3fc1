"""The materialized catalog must (a) round-trip the derived catalog
exactly and (b) push listing predicates down to the Parquet scan —
the property the whole metadata-query design at 100 TB rests on."""

from __future__ import annotations

from pyspark.sql import functions as F

from aistore_spark.catalog import objects_catalog
from aistore_spark.operators.listing import list_objects
from aistore_spark.sources.catalog_store import load_objects, materialize_objects
from aistore_spark.sources.tables import load_table


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_materialized_catalog_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    objects = objects_catalog(load_table(spark, sf_dir, "documents"))
    path = str(tmp_path / "objects_catalog")
    materialize_objects(objects.drop("custom"), path)

    stored = load_objects(spark, path)
    assert stored.count() == objects.count()

    # same listing results through the stored catalog
    a = list_objects(objects, prefix="en/", props=("name", "size")).collect()
    b = list_objects(stored, prefix="en/", props=("name", "size")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # and the predicates reach the scan: name filter in PushedFilters,
    # bucket filter prunes partitions
    page = list_objects(
        stored, prefix="en/", continuation_token="en/src2", page_size=10
    )
    plan = _formatted_plan(page)
    assert "PushedFilters" in plan and "StartsWith(name,en/)" in plan, plan
    assert "GreaterThan(name,en/src2)" in plan, plan

    bucket_scoped = stored.filter(F.col("bucket") == "ais://src3")
    plan2 = _formatted_plan(bucket_scoped)
    assert "PartitionFilters" in plan2 and "src3" in plan2, plan2
