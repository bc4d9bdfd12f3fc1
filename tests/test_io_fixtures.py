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
    assert json.loads(marker.read_text())["sample_mod"] == 1

    # a format bump PUBLISHES A NEW DIRECTORY (atomic rename) — the old
    # one is never mutated, so a concurrent reader can't observe a
    # half-rebuilt fixture (the r9 parallel-pytest race)
    monkeypatch.setattr(
        io_fixtures, "FORMAT_VERSION", io_fixtures.FORMAT_VERSION + 1
    )
    shards2 = io_fixtures.materialize_shards(spark, sf_dir)
    assert shards2 != shards
    assert (Path(shards2) / "_SUCCESS").exists()
    assert marker.exists()  # old dir untouched
