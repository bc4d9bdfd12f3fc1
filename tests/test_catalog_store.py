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


def test_compaction_shrinks_log_and_preserves_state(spark, sf_dir, tmp_path):
    """m13's contract, isolated: folding the chunk log via
    read_resolved -> write_chunked_catalog must (a) strictly shrink
    the chunk count and (b) leave the resolved state bit-identical —
    including per-row checksums, which the m13 [Q] row's md5 doesn't
    cover."""
    import json

    from aistore_spark.operators import maintenance
    from aistore_spark.sources import catalog_source
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    objects = objects_catalog(docs)
    path = str(tmp_path / "cat")
    catalog_source.write_chunked_catalog(objects, path, n_chunks=8)
    maintenance.merge_into(
        path,
        objects.filter(F.col("name").startswith("en/")).select(
            "bucket", "name", (F.col("size") + 1).alias("size"),
            "checksum", F.lit("7").alias("version"),
        ),
        op="upsert",
    )
    maintenance.merge_into(
        path,
        objects.limit(50).select(
            "bucket", "name", "size", "checksum", "version"
        ),
        op="delete",
    )
    n_log = len(json.loads(
        (tmp_path / "cat" / catalog_source.MANIFEST).read_text()
    )["chunks"])
    resolved = catalog_source.read_resolved(spark, path)

    cpath = str(tmp_path / "cat_compact")
    cmanifest = catalog_source.write_chunked_catalog(
        resolved, cpath, n_chunks=4
    )
    assert len(cmanifest["chunks"]) < n_log
    compacted = catalog_source.read_resolved(spark, cpath)
    assert sorted(map(tuple, compacted.collect())) == sorted(
        map(tuple, resolved.collect())
    )
