"""Movement-plan invariants (M1-M10, F5): the diff statuses partition
the namespace; prefetch never fetches what is cached; sync-prune and
prefetch are disjoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from aistore_spark.catalog import objects_catalog, remote_objects_catalog
from aistore_spark.operators import joins, movement
from aistore_spark.sources.tables import load_table


def _local_remote(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    local = objects_catalog(docs).filter(F.col("doc_id") % 7 != 0)
    return local, remote_objects_catalog(docs)


def test_diff_partitions_namespace(spark, sf_dir):
    local, remote = _local_remote(spark, sf_dir)
    diff = joins.catalog_diff(local, remote)
    n_all = diff.count()
    assert n_all == local.select("name").union(remote.select("name")).distinct().count()
    by_status = dict(
        (r.status, r.n)
        for r in diff.groupBy("status").agg(F.count("*").alias("n")).collect()
    )
    assert set(by_status) <= {"ver_removed", "remote_only", "ver_changed", "in_sync"}
    assert sum(by_status.values()) == n_all
    assert by_status.get("ver_changed", 0) > 0
    assert by_status.get("ver_removed", 0) > 0


def test_prefetch_skips_cached(spark, sf_dir):
    local, remote = _local_remote(spark, sf_dir)
    plan = movement.prefetch_plan(remote, local)
    cached_names = {r.name for r in local.filter(F.col("cached")).collect()}
    for r in plan.collect():
        assert r.name not in cached_names


def test_sync_prune_is_local_minus_remote(spark, sf_dir):
    local, remote = _local_remote(spark, sf_dir)
    prune = {r.name for r in movement.sync_prune_plan(local, remote).collect()}
    lnames = {r.name for r in local.select("name").collect()}
    rnames = {r.name for r in remote.select("name").collect()}
    assert prune == lnames - rnames


def test_catalog_upsert_scd1(spark, sf_dir):
    from aistore_spark.operators.maintenance import (
        delete_from_catalog,
        upsert_catalog,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = objects_catalog(docs)
    n0 = base.count()
    # bump version of 10 objects + add 5 brand-new ones
    changed = base.limit(10).withColumn("version", F.lit("bumped"))
    fresh = (
        base.limit(5)
        .withColumn("name", F.concat(F.lit("new/"), F.col("name")))
    )
    merged = upsert_catalog(base, changed.unionByName(fresh))
    assert merged.count() == n0 + 5
    assert merged.filter(F.col("version") == "bumped").count() == 10
    assert merged.select("name").distinct().count() == n0 + 5

    after_delete = delete_from_catalog(merged, fresh.select("name"))
    assert after_delete.count() == n0


def test_promote_plan_flags(spark, sf_dir):
    from aistore_spark.catalog import fshare_files

    docs = load_table(spark, sf_dir, "documents")
    objects = objects_catalog(docs)
    files = fshare_files(docs)

    # every share file is nested under lang/source/ -> non-recursive
    # promotes nothing (apc.PromoteArgs.Recursive)
    assert movement.promote_plan(files, objects, recursive=False).count() == 0

    # OverwriteDst flips skip_exists -> overwrite; sidecars still put
    ow = movement.promote_plan(files, objects, overwrite_dst=True)
    assert {r["action"] for r in ow.select("action").distinct().collect()} == {
        "overwrite",
        "put",
    }

    # DeleteSrc marks only the files actually promoted
    pl = movement.promote_plan(files, objects, delete_src=True)
    assert {
        (r["action"], r["delete_after"])
        for r in pl.select("action", "delete_after").distinct().collect()
    } == {("skip_exists", False), ("put", True)}


def test_blob_chunk_plan_covers_every_byte(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    objects = objects_catalog(docs)
    plan = movement.blob_chunk_plan(
        objects, chunk_size=64, min_bytes_per_worker=512,
        max_workers=8, size_threshold=256,
    )
    per_obj = (
        plan.groupBy("name")
        .agg(
            F.sum("chunk_len").alias("covered"),
            F.min("chunk_start").alias("first"),
            F.max(F.col("chunk_start") + F.col("chunk_len")).alias("end"),
            F.count("*").alias("n_chunks"),
            F.countDistinct("worker").alias("n_workers_used"),
            F.max("worker").alias("max_worker"),
        )
        .join(objects.select("name", "size"), "name")
    )
    bad = per_obj.filter(
        (F.col("covered") != F.col("size"))
        | (F.col("first") != 0)
        | (F.col("end") != F.col("size"))
        | (F.col("max_worker") >= 8)
        | (F.col("n_chunks") != F.expr("(size + 63) div 64"))
    )
    assert bad.count() == 0
    # chunks within an object are disjoint: n_chunks distinct starts
    dup = plan.groupBy("name", "chunk_start").count().filter("count > 1")
    assert dup.count() == 0
    # no shuffle in the plan (generate-and-explode only)
    assert "Exchange" not in plan._jdf.queryExecution().executedPlan().toString()


def test_mpu_plan_etag_matches_serial(spark, sf_dir):
    import hashlib

    docs = load_table(spark, sf_dir, "documents").limit(50)
    content = docs.select(
        F.col("doc_id").cast("string").alias("name"),
        F.col("text").alias("content"),
    )
    got = {
        r["name"]: (r["n_parts"], r["etag"], r["size"])
        for r in movement.mpu_plan(content, part_size=100).collect()
    }
    for r in content.collect():
        b = r["content"].encode()
        parts = [b[i : i + 100] for i in range(0, len(b), 100)]
        cat = "".join(hashlib.md5(p).hexdigest() for p in parts)
        etag = hashlib.md5(cat.encode()).hexdigest() + f"-{len(parts)}"
        assert got[r["name"]] == (len(parts), etag, len(b))
