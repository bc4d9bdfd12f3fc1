"""Join-operator properties: EKM first-match priority, batch-join
cardinality."""

from __future__ import annotations

from pyspark.sql import functions as F

from aistore_spark.catalog import batch_requests, ekm_table, members_catalog
from aistore_spark.operators import joins
from aistore_spark.sources.tables import load_table


def test_ekm_first_match_wins(spark, sf_dir):
    members = members_catalog(load_table(spark, sf_dir, "lineitem"))
    records = members.select("base").distinct()
    routed = joins.ekm_route(records, ekm_table(spark))
    rows = routed.collect()
    assert len(rows) == records.count(), "exactly one route per record"
    for r in rows:
        oid = int(r.base[4:])
        if oid < 1000:
            assert r.matched_priority == 1, r
        elif oid < 3000:
            assert r.matched_priority == 2, r
        elif oid < 10000:
            assert r.matched_priority == 3, r
        else:
            assert r.matched_priority == -1 and r.dst_shard == "__missing__", r


def test_get_batch_join_preserves_cardinality(spark, sf_dir):
    req = batch_requests(load_table(spark, sf_dir, "events"))
    members = members_catalog(load_table(spark, sf_dir, "lineitem"))
    out = joins.get_batch_join(req, members)
    assert out.count() == req.count(), "one output row per request, always"
    inner = joins.get_batch_join(req, members, continue_on_err=False)
    n_missing = out.filter(F.col("status") == "missing").count()
    assert inner.count() == req.count() - n_missing


def test_lsh_hot_bucket_split_bounds_work(spark, sf_dir):
    from aistore_spark.operators.dedup import lsh_candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    full = lsh_candidate_pairs(docs, bands=8)
    split = lsh_candidate_pairs(docs, bands=8, max_bucket=10)
    full_pairs = {(r.doc_a, r.doc_b) for r in full.collect()}
    split_pairs = {(r.doc_a, r.doc_b) for r in split.collect()}
    # sub-splitting only removes candidates, never invents them
    assert split_pairs <= full_pairs
    assert split_pairs, "split run must still find candidates"


def test_mixed_join_naming_and_inner_mode(spark, sf_dir):
    """MossIn naming (NameInRespArch, api/apc/ml.go:122-136):
    OnlyObjName drops the bucket prefix; archpath appends /<archpath>;
    continue_on_err=False keeps only ok rows."""
    from pyspark.sql import functions as F

    from aistore_spark.catalog import members_catalog, mixed_batch_requests
    from aistore_spark.operators.joins import get_batch_join_mixed
    from aistore_spark.sources.tables import load_table

    members = members_catalog(load_table(spark, sf_dir, "lineitem"))
    reqs = mixed_batch_requests(load_table(spark, sf_dir, "events")).limit(600)
    full = get_batch_join_mixed(reqs, members)
    only = get_batch_join_mixed(reqs, members, only_obj_name=True)
    f = {r.req_idx: r for r in full.collect()}
    o = {r.req_idx: r for r in only.collect()}
    assert set(f) == set(o)
    ok_seen = arch_seen = False
    for i, r in f.items():
        expect_full = f"ais://shards/{r.objname}"
        if r.archpath:
            expect_full += f"/{r.archpath}"
            arch_seen = True
        expect_only = expect_full.removeprefix("ais://shards/")
        if r.status != "ok":
            expect_full = "__404__/" + expect_full
            expect_only = "__404__/" + expect_only
        else:
            ok_seen = True
        assert r.out_name == expect_full
        assert o[i].out_name == expect_only
    assert ok_seen and arch_seen
    inner = get_batch_join_mixed(reqs, members, continue_on_err=False)
    assert inner.filter(F.col("status") != "ok").count() == 0
    assert inner.count() == full.filter(F.col("status") == "ok").count()


def test_salted_join_equals_plain_join(spark):
    """salted_join must be result-identical to the plain equi-join on a
    skewed key distribution (one key holding half the fact side)."""
    from aistore_spark.operators.joins import salted_join

    hot = spark.createDataFrame(
        [("k0" if i % 2 == 0 else f"k{i % 7}", i) for i in range(2000)],
        "key string, val bigint",
    )
    dim = spark.createDataFrame(
        [(f"k{i}", f"d{i}") for i in range(7)], "key string, attr string"
    )
    plain = {
        (r.key, r.val, r.attr) for r in hot.join(dim, "key").collect()
    }
    salted = {
        (r.key, r.val, r.attr)
        for r in salted_join(hot, dim, "key", n_salts=8).collect()
    }
    assert salted == plain and len(plain) == 2000

    # left outer stays exact too: unmatched hot rows null-extend once
    hot2 = hot.unionByName(
        spark.createDataFrame([("k99", -1)], "key string, val bigint")
    )
    left = {
        (r.key, r.val, r.attr)
        for r in salted_join(hot2, dim, "key", how="left", n_salts=8).collect()
    }
    assert left == plain | {("k99", -1, None)}


def test_salted_join_rejects_right_and_full(spark):
    """Regression: the dim side is replicated per salt, so right/full
    outer would emit spurious null-extended rows — must raise."""
    import pytest

    from aistore_spark.operators.joins import salted_join

    hot = spark.createDataFrame([("a", 1)], "key string, val bigint")
    dim = spark.createDataFrame([("a", "x")], "key string, attr string")
    for how in ("right", "full", "full_outer", "right_outer", "cross"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(hot, dim, "key", how=how)
