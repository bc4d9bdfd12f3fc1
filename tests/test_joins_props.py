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
