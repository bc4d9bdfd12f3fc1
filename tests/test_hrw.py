"""HRW placement properties (J4, core/meta/hrw.go): deterministic,
and roughly uniform across targets; removing a target only remaps the
objects that lived on it (the rendezvous-hashing minimal-disruption
property — the reason the reference uses it for rebalance)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from aistore_spark.catalog import objects_catalog
from aistore_spark.sources.tables import load_table


def _placement(spark, names, n_targets):
    targets = spark.range(n_targets).select(F.col("id").alias("target"))
    scored = names.crossJoin(F.broadcast(targets)).select(
        "name", "target", F.xxhash64(F.col("name"), F.col("target")).alias("h")
    )
    w = Window.partitionBy("name").orderBy(F.col("h").desc(), F.col("target"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("name", "target")
    )


def test_hrw_balanced_and_minimally_disruptive(spark, sf_dir):
    names = objects_catalog(load_table(spark, sf_dir, "documents")).select("name")
    n = names.count()

    p8 = {r.name: r.target for r in _placement(spark, names, 8).collect()}
    counts = {}
    for t in p8.values():
        counts[t] = counts.get(t, 0) + 1
    assert len(counts) == 8
    assert max(counts.values()) < 3 * n / 8, f"skewed placement: {counts}"

    # drop target 7: only its objects may move, everyone else stays
    p7 = {r.name: r.target for r in _placement(spark, names, 7).collect()}
    moved = [nm for nm in p8 if p8[nm] != 7 and p7[nm] != p8[nm]]
    assert moved == [], "non-evicted objects must not move when a target leaves"
    assert all(p7[nm] != 7 for nm in p8 if p8[nm] == 7)


def test_hrw_placement_xxhash_matches_window_form(spark, sf_dir):
    """The aggregation-shaped production form (max(struct), no window)
    must produce the same per-target counts as the row_number form."""
    from aistore_spark.operators.placement import hrw_placement_xxhash

    names = objects_catalog(load_table(spark, sf_dir, "documents")).select("name")
    counts = {
        r.target: r.n_objects
        for r in hrw_placement_xxhash(names, n_targets=8).collect()
    }
    p8 = {r.name: r.target for r in _placement(spark, names, 8).collect()}
    want = {}
    for t in p8.values():
        want[t] = want.get(t, 0) + 1
    assert counts == want
