"""Aggregations: bucket summary (A1), shard summary (A2), dedup (A5).

Reference: the bucket-summary xaction visits every object per target
(``xact/xs/nsumm.go:330-364``), keeps partial ``{count present/remote,
min/avg/max size, total size}``, merges partials (``nsumm.go:287-329``)
and the proxy does the final merge (``ais/prxbsumm.go``). That is
exactly Spark's partial/final hash aggregate — one ``groupBy``.

Hash-safety for the oracle: sizes are BIGINT so count/min/max/sum are
exact; ``avg`` is computed as ``round(sum/count, 6)`` in both engines so
no float-summation order can differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_summary(objects: DataFrame) -> DataFrame:
    """A1: per-bucket object counts and size stats.

    Map-side partial aggregation makes this a single shuffle of one row
    per (partition, bucket); at 100 TB the shuffle is O(buckets), not
    O(objects).
    """
    return objects.groupBy("bucket").agg(
        F.count("*").alias("obj_count"),
        F.sum(F.when(F.col("cached"), 1).otherwise(0)).alias("present_count"),
        F.sum(F.when(~F.col("cached"), 1).otherwise(0)).alias("remote_count"),
        F.min("size").alias("min_size"),
        F.max("size").alias("max_size"),
        F.sum("size").alias("total_size"),
        F.round(F.sum("size").cast("double") / F.count("*"), 6).alias("avg_size"),
    )


def shard_summary(members: DataFrame) -> DataFrame:
    """A2: per-bucket shard/TAR coverage stats.

    Reference result type ``api/apc/shard_idx.go:14-43`` with an explicit
    ``Aggregate()`` merge — Spark's partial/final agg replicates it.
    """
    per_shard = members.groupBy("bucket", "shard").agg(
        F.count("*").alias("archived_objs"),
        F.sum("size").alias("shard_bytes"),
    )
    return per_shard.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("shards"),
        F.sum("archived_objs").alias("archived_objs"),
        F.sum("shard_bytes").alias("tar_size"),
        F.max("archived_objs").alias("max_shard_objs"),
    )


def duplicate_records(members: DataFrame) -> DataFrame:
    """A5: dsort duplicate-record detection.

    Reference aborts/warns on records with identical (name, ext) across
    input shards (``ext/dsort/shard/record.go:177-189``,
    ``request_spec.go:196-198``).
    """
    return (
        members.groupBy("base", "ext")
        .agg(F.count("*").alias("occurrences"))
        .filter(F.col("occurrences") > 1)
    )
