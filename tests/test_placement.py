"""Placement-plan invariants (M5 LRU, M7 rebalance, M8 mirror/EC):
watermark convergence, rendezvous minimal movement, slice accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from aistore_spark.catalog import objects_catalog
from aistore_spark.operators import placement
from aistore_spark.sources.tables import load_table


def _objects(spark, sf_dir):
    return objects_catalog(load_table(spark, sf_dir, "documents"))


def test_lru_stops_below_low_watermark(spark, sf_dir):
    objects = _objects(spark, sf_dir)
    plan = placement.lru_evict_plan(objects, n_mpaths=4, high_wm=90, low_wm=75)
    rows = {r["mountpath"]: r for r in plan.collect()}
    capacity = (
        objects.filter("cached").agg(F.expr("sum(size) div 4")).collect()[0][0]
    )
    assert rows, "watermark trigger must fire at every SF"
    for r in rows.values():
        # evicted down to (but not overshooting past) the low watermark:
        # one fewer eviction would still be above it
        assert r["used_after"] * 100 <= capacity * 75
        assert r["used_before"] * 100 > capacity * 90
        assert r["n_evicted"] > 0 and r["bytes_freed"] > 0


def test_rebalance_minimal_movement_on_add(spark, sf_dir):
    objects = _objects(spark, sf_dir)
    plan = placement.rebalance_plan(
        objects, old_targets=list(range(8)), new_targets=list(range(9))
    ).collect()
    # rendezvous hashing: adding a target only ever moves objects TO it
    assert plan and all(r["dst_target"] == 8 for r in plan)
    n_moved = sum(r["n_objects"] for r in plan)
    total = objects.count()
    # expected ~1/9 of the corpus; allow generous hash variance
    assert 0.04 < n_moved / total < 0.20


def test_rebalance_decommission_drains_only_lost_target(spark, sf_dir):
    objects = _objects(spark, sf_dir)
    plan = placement.rebalance_plan(
        objects,
        old_targets=list(range(8)),
        new_targets=[t for t in range(8) if t != 3],
    ).collect()
    assert plan and all(r["src_target"] == 3 for r in plan)
    assert {r["dst_target"] for r in plan}.issubset(set(range(8)) - {3})


def test_mirror_copy_accounting(spark, sf_dir):
    objects = _objects(spark, sf_dir)
    plan = placement.mirror_plan(objects, n_targets=8)
    n_copies = plan.agg(F.sum("n_copies")).collect()[0][0]
    expected = objects.agg(F.sum(F.col("copies") - 1)).collect()[0][0]
    assert n_copies == expected


def test_ec_slice_accounting(spark, sf_dir):
    objects = _objects(spark, sf_dir)
    plan = placement.ec_plan(
        objects, data_slices=4, parity_slices=2, obj_size_limit=256, n_targets=8
    )
    by_kind = {
        r["kind"]: (r["n"], r["b"])
        for r in plan.groupBy("kind")
        .agg(F.sum("n_pieces").alias("n"), F.sum("bytes").alias("b"))
        .collect()
    }
    big = objects.filter(F.col("size") >= 256)
    small = objects.filter(F.col("size") < 256)
    n_big, n_small = big.count(), small.count()
    slice_bytes = big.agg(
        F.sum(F.expr("(size + 3) div 4")).alias("s")
    ).collect()[0][0]
    small_bytes = small.agg(F.sum("size")).collect()[0][0]
    assert by_kind["data"] == (4 * n_big, 4 * slice_bytes)
    assert by_kind["parity"] == (2 * n_big, 2 * slice_bytes)
    assert by_kind["replica"] == (2 * n_small, 2 * small_bytes)


def test_dup_groups_transitive_chain(spark):
    from aistore_spark.operators.dedup import dup_groups

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a bigint, doc_b bigint",
    )
    got = {r["doc_id"]: r["group_id"] for r in dup_groups(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}
