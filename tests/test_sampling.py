"""Sampling invariants: splits are complete/disjoint/deterministic,
stratified quotas are exact and stable under physical layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aistore_spark.catalog import objects_catalog
from aistore_spark.operators import sampling
from aistore_spark.sources.tables import load_table


def _objects(spark, sf_dir):
    return objects_catalog(load_table(spark, sf_dir, "documents"))


def test_hash_split_complete_and_stable(spark, sf_dir):
    objects = _objects(spark, sf_dir)
    a = sampling.hash_split(objects, {"train": 98, "val": 1, "test": 1})
    # complete: every row gets a split; proportions in the right regime
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == objects.count()
    assert counts["train"] / total > 0.9
    # deterministic: same membership after a physical reshuffle
    b = sampling.hash_split(objects.repartition(7), {"train": 98, "val": 1, "test": 1})
    assert sorted(map(tuple, a.select("name", "split").collect())) == sorted(
        map(tuple, b.select("name", "split").collect())
    )


def test_hash_split_rejects_bad_weights(spark, sf_dir):
    with pytest.raises(ValueError):
        sampling.hash_split(_objects(spark, sf_dir), {"train": 50, "val": 10})


def test_stratified_sample_exact_quota_and_stable(spark, sf_dir):
    objects = _objects(spark, sf_dir)
    quota = 7
    kept = sampling.stratified_sample(objects, "lang", quota=quota)
    got = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    want = {
        r["lang"]: min(r["n"], quota)
        for r in objects.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == want
    # same rows regardless of input partitioning
    again = sampling.stratified_sample(objects.repartition(5), "lang", quota=quota)
    assert sorted(r["name"] for r in kept.select("name").collect()) == sorted(
        r["name"] for r in again.select("name").collect()
    )
