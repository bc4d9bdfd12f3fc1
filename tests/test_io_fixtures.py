"""Real on-disk shard fixtures (sources/io_fixtures.py): the write →
binaryFile scan → expand → parse round trip must reproduce the members
catalog exactly, and the _SUCCESS marker must cache/invalidate right."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from aistore_spark import catalog
from aistore_spark.sources import io_fixtures
from aistore_spark.sources.tables import load_table


def test_round_trip_matches_catalog(spark, sf_dir, monkeypatch, tmp_path):
    monkeypatch.setattr(io_fixtures, "_REPO", tmp_path)
    shards = io_fixtures.materialize_shards(spark, sf_dir)

    members = catalog.members_catalog(load_table(spark, sf_dir, "lineitem"))
    expect = {
        (r.shard, r.member, r.key_str)
        for r in members.select("shard", "member", "key_str").collect()
    }
    got_rows = (
        io_fixtures.read_shard_members(spark, shards)
        .withColumn(
            "key_str",
            F.expr("substring(cast(bytes as string), length(member) + 2)"),
        )
        .select("shard", "member", "key_str", "size", "bytes")
        .collect()
    )
    got = {(r.shard, r.member, r.key_str) for r in got_rows}
    assert got == expect
    # payload bytes on disk are exactly synth_payload(member, key_str)
    for r in got_rows[:50]:
        assert bytes(r.bytes) == f"{r.member}:{r.key_str}".encode()
        assert r.size == len(bytes(r.bytes))

    # cached: second call is a no-op (marker mtime unchanged)
    marker = Path(shards) / "_SUCCESS"
    before = marker.stat().st_mtime_ns
    assert io_fixtures.materialize_shards(spark, sf_dir) == shards
    assert marker.stat().st_mtime_ns == before

    # stale format version → rebuild
    meta = json.loads(marker.read_text())
    meta["format_version"] = -1
    marker.write_text(json.dumps(meta))
    io_fixtures.materialize_shards(spark, sf_dir)
    assert (
        json.loads(marker.read_text())["format_version"]
        == io_fixtures.FORMAT_VERSION
    )
