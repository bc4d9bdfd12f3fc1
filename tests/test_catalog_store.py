"""The materialized catalog must (a) round-trip the derived catalog
exactly and (b) push listing predicates down to the Parquet scan —
the property the whole metadata-query design at 100 TB rests on."""

from __future__ import annotations

from pyspark.sql import functions as F

from aistore_spark.catalog import objects_catalog, remote_objects_catalog
from aistore_spark.operators.joins import catalog_diff
from aistore_spark.operators.listing import list_objects
from aistore_spark.sources.catalog_store import (
    load_bucketed,
    load_objects,
    materialize_bucketed,
    materialize_objects,
)
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


def test_bucketed_catalog_diff_no_exchange(spark, sf_dir, tmp_path):
    """Two catalogs bucketed on name must diff with zero Exchange —
    the J3/F5/M10 co-location contract at billion-object scale."""
    docs = load_table(spark, sf_dir, "documents")
    local, remote = objects_catalog(docs), remote_objects_catalog(docs)

    materialize_bucketed(
        local.select("name", "version"),
        "t_local_cat",
        str(tmp_path / "local_cat"),
        buckets=8,
    )
    materialize_bucketed(
        remote.select("name", "version"),
        "t_remote_cat",
        str(tmp_path / "remote_cat"),
        buckets=8,
    )
    try:
        diff = catalog_diff(
            load_bucketed(spark, "t_local_cat"),
            load_bucketed(spark, "t_remote_cat"),
        )
        plan = _formatted_plan(diff)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan

        # and the bucketed diff agrees with the plain one
        expected = catalog_diff(local, remote)
        assert sorted(map(tuple, diff.collect())) == sorted(
            map(tuple, expected.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_local_cat")
        spark.sql("DROP TABLE IF EXISTS t_remote_cat")
