"""Materialized catalog storage — the deployment shape of catalog.py.

The derived-view catalogs are the testdata stand-in; a deployment
materializes them as partitioned Parquet so that listing predicates hit
Parquet row-group statistics:

- partitioned by ``bucket`` → partition pruning for bucket-scoped ops;
- sorted by ``name`` within partitions → min/max row-group pruning for
  prefix + continuation-token predicates (the S1 hot path).

``materialize_objects`` writes that layout; reading back through
``load_objects`` gives a frame whose prefix filters show up in
``PushedFilters`` of the physical plan (asserted by
tests/test_catalog_store.py — this closes the "derived name defeats
pushdown" caveat in SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def materialize_objects(objects: DataFrame, path: str, buckets: int = 8) -> None:
    """Write the objects catalog in its scan-optimized layout."""
    (
        objects.repartition(buckets, "bucket")
        .sortWithinPartitions("bucket", "name")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def load_objects(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def materialize_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str = "name",
    buckets: int = 32,
) -> None:
    """Write a catalog as a Spark-native bucketed table on ``key``.

    This is the co-location contract for the catalog-vs-catalog
    operators (J3 LsDiff, F5 latest-ver sync, M10 prune): two catalogs
    bucketed on ``name`` with the same bucket count join with ZERO
    Exchange on either side — at a billion objects per bucket listing
    (`cmn/objlist_utils.go` scale), the diff becomes a per-bucket merge
    instead of a full 2-sided shuffle.  ``sortBy(key)`` additionally
    drops the SortMergeJoin's per-side Sort.  Asserted by
    tests/test_catalog_store.py::test_bucketed_catalog_diff_no_exchange.
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def load_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
