"""Declared [Q] queries: the driver-checked operator inventory.

Each entry pairs a Spark DataFrame pipeline (the engine operators from
:mod:`aistore_spark.operators` applied to the derived catalogs) with an
ANSI-SQL oracle that DuckDB runs on the same parquet tables. The driver
compares row count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- counts/row_numbers are BIGINT on both sides;
- float aggregation is avoided (exact integer/decimal math, or
  ``round(sum/count, 6)``) so summation order cannot differ.

Registry keys follow SURVEY.md §2 operator ids (s1_, f2_, j1_, d6_ ...).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aistore_spark import catalog, oracles
from aistore_spark.operators import listing, summary
from aistore_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---- fixture shortcuts ----------------------------------------------------


def _objects(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.objects_catalog(load_table(spark, sf_dir, "documents"))


def _remote(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.remote_objects_catalog(load_table(spark, sf_dir, "documents"))


def _members(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.members_catalog(load_table(spark, sf_dir, "lineitem"))


def _requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    return catalog.batch_requests(load_table(spark, sf_dir, "events"))


# ---- S: scans / listings ---------------------------------------------------


@register(
    "s1_list_prefix_page",
    oracles.with_catalogs(
        """
        SELECT name, size, checksum, atime_ns, version
        FROM objects
        WHERE name LIKE 'en/%' AND name > 'en/src1'
        ORDER BY name LIMIT 100
        """,
        "objects",
    ),
)
def s1_list_prefix_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: list-objects page — prefix + continuation token + page size.

    Reference: LsoMsg paging, api/apc/lsmsg.go:195-240.
    """
    return listing.list_objects(
        _objects(spark, sf_dir),
        prefix="en/",
        continuation_token="en/src1",
        page_size=100,
        props=listing.DEFAULT_PROPS,
    )


@register(
    "s2_props_name_size",
    oracles.with_catalogs(
        """
        SELECT name, size FROM objects WHERE name LIKE 'fr/%' ORDER BY name
        """,
        "objects",
    ),
)
def s2_props_name_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: LsNameSize fast-path projection (api/apc/lsmsg.go:35-38)."""
    return listing.list_objects(
        _objects(spark, sf_dir), prefix="fr/", props=("name", "size")
    )


@register(
    "s3_not_cached",
    oracles.with_catalogs(
        """
        SELECT name, version, size FROM objects
        WHERE NOT cached ORDER BY name
        """,
        "objects",
    ),
)
def s3_not_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: LsNotCached presence filter (api/apc/lsmsg.go:20-99)."""
    return listing.list_objects(
        _objects(spark, sf_dir), cached=False, props=("name", "version", "size")
    )


@register(
    "s5_virtual_dirs",
    oracles.with_catalogs(
        """
        SELECT DISTINCT
          'zh/' || CASE WHEN instr(rest, '/') > 0
                        THEN substr(rest, 1, instr(rest, '/'))
                        ELSE rest END AS entry,
          instr(rest, '/') > 0 AS is_dir
        FROM (
          SELECT substr(name, length('zh/') + 1) AS rest
          FROM objects WHERE name LIKE 'zh/%'
        )
        """,
        "objects",
    ),
)
def s5_virtual_dirs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: non-recursive listing w/ virtual dirs (LsNoRecursion)."""
    return listing.list_virtual_dirs(_objects(spark, sf_dir), "zh/")


# ---- A: aggregations --------------------------------------------------------


@register(
    "a1_bucket_summary",
    oracles.with_catalogs(
        """
        SELECT
          bucket,
          count(*) AS obj_count,
          sum(CASE WHEN cached THEN 1 ELSE 0 END) AS present_count,
          sum(CASE WHEN cached THEN 0 ELSE 1 END) AS remote_count,
          min(size) AS min_size,
          max(size) AS max_size,
          sum(size) AS total_size,
          round(CAST(sum(size) AS DOUBLE) / count(*), 6) AS avg_size
        FROM objects GROUP BY bucket
        """,
        "objects",
    ),
)
def a1_bucket_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: bucket summary (api/apc/bsummary.go:14-52)."""
    return summary.bucket_summary(_objects(spark, sf_dir))


@register(
    "a2_shard_summary",
    oracles.with_catalogs(
        """
        SELECT
          bucket,
          count(*) AS shards,
          sum(archived_objs) AS archived_objs,
          sum(shard_bytes) AS tar_size,
          max(archived_objs) AS max_shard_objs
        FROM (
          SELECT bucket, shard,
                 count(*) AS archived_objs, sum(size) AS shard_bytes
          FROM members GROUP BY bucket, shard
        )
        GROUP BY bucket
        """,
        "members",
    ),
)
def a2_shard_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: shard/TAR coverage summary (api/apc/shard_idx.go:14-43)."""
    return summary.shard_summary(_members(spark, sf_dir))


@register(
    "a5_duplicate_records",
    oracles.with_catalogs(
        """
        SELECT base, ext, count(*) AS occurrences
        FROM members GROUP BY base, ext HAVING count(*) > 1
        """,
        "members",
    ),
)
def a5_duplicate_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: dsort duplicate detection (ext/dsort/shard/record.go:177-189)."""
    return summary.duplicate_records(_members(spark, sf_dir))
