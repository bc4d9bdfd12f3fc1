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
    """A2: per-bucket shard/TAR + index-health coverage stats.

    Full ``ShardSummResult`` surface (``api/apc/shard_idx.go:19-28``):
    ``tar_objs/tar_size`` count every local TAR; ``shards/shard_size/
    archived_objs`` count only TARs whose shard index is *valid*;
    ``stale_indexes`` are TARs whose index no longer matches the shard
    content; ``invalid_indexes`` failed to load. Per-field ``+=`` merge
    (``Aggregate()``, ``shard_idx.go:36-44``) is Spark's partial/final
    aggregate.

    Index health is derived deterministically from the shard's content
    fingerprint (md5 over the ordered member list — the checksum an
    index stores to detect staleness, ``xact/xs/shard_summ.go``): first
    hex digit ``c|d|e`` → stale, ``f`` → invalid, else valid. On real
    shards the fingerprint comparison is index-checksum vs shard
    checksum; the derivation keeps the same three-way classification.

    Scale: per-shard agg then per-bucket agg — two map-side-combined
    shuffles, O(shards) rows after the first.
    """
    per_shard = members.groupBy("bucket", "shard").agg(
        F.count("*").alias("archived_objs"),
        F.sum("size").alias("shard_bytes"),
        F.md5(F.array_join(F.sort_array(F.collect_list("member")), ",")).alias(
            "idx_fp"
        ),
    )
    digit = F.substring("idx_fp", 1, 1)
    health = (
        F.when(digit == "f", "invalid")
        .when(digit.isin("c", "d", "e"), "stale")
        .otherwise("valid")
    )
    per_shard = per_shard.withColumn("idx_health", health)
    valid = F.col("idx_health") == "valid"
    return per_shard.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("tar_objs"),
        F.sum("shard_bytes").alias("tar_size"),
        F.sum(valid.cast("bigint")).alias("shards"),
        F.sum(F.when(valid, F.col("shard_bytes")).otherwise(0)).alias("shard_size"),
        F.sum(F.when(valid, F.col("archived_objs")).otherwise(0)).alias(
            "archived_objs"
        ),
        F.sum((F.col("idx_health") == "stale").cast("bigint")).alias(
            "stale_indexes"
        ),
        F.sum((F.col("idx_health") == "invalid").cast("bigint")).alias(
            "invalid_indexes"
        ),
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
