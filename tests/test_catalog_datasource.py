"""The `aiscatalog` Python DataSource (sources/catalog_source.py):
planner-level chunk pruning via pushFilters + manifest, row-level
equality with the plain parquet read, and graceful fallback for
filters the reader doesn't handle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    IsNotNull,
    StringStartsWith,
)

from aistore_spark.catalog import objects_catalog
from aistore_spark.sources import catalog_source as cs
from aistore_spark.sources.tables import load_table
from aistore_spark.util import ensure_shipped


@pytest.fixture(scope="module")
def chunked(spark, sf_dir, tmp_path_factory):
    ensure_shipped(spark)
    path = str(tmp_path_factory.mktemp("aiscat") / "cat")
    objs = objects_catalog(load_table(spark, sf_dir, "documents"))
    manifest = cs.write_chunked_catalog(objs, path, n_chunks=8)
    return path, manifest, objs


def test_manifest_covers_disjoint_sorted_ranges(chunked):
    _, manifest, _ = chunked
    chunks = sorted(manifest["chunks"], key=lambda c: c["min_name"])
    assert len(chunks) >= 4
    for a, b in zip(chunks, chunks[1:]):
        assert a["max_name"] <= b["min_name"]  # range partitioning


def test_reader_prunes_chunks_at_planning_time(chunked):
    path, manifest, _ = chunked
    r = cs.CatalogReader({"path": path})
    remaining = list(
        r.pushFilters(
            [StringStartsWith(("name",), "en/"), GreaterThan(("name",), "en/src1")]
        )
    )
    assert remaining == []  # both fully handled
    parts = r.partitions()
    assert 0 < len(parts) < len(manifest["chunks"]), (
        f"{len(parts)}/{len(manifest['chunks'])} chunks - no pruning"
    )
    # the surviving chunks are exactly those whose range intersects
    lo, hi = "en/src1", "en/￿"
    want = [
        c["file"]
        for c in manifest["chunks"]
        if c["max_name"] >= lo and c["min_name"] <= hi
    ]
    assert sorted(r.selected_files) == sorted(want)


def test_point_lookup_prunes_to_one_chunk(chunked):
    path, manifest, objs = chunked
    some_name = objs.orderBy("name").limit(1).collect()[0].name
    r = cs.CatalogReader({"path": path})
    assert list(r.pushFilters([EqualTo(("name",), some_name)])) == []
    assert len(r.partitions()) == 1


def test_end_to_end_equals_parquet_read(spark, chunked):
    path, _, objs = chunked
    for preds in (
        [F.col("name").startswith("en/")],
        [F.col("name").startswith("en/"), F.col("name") > "en/src1"],
        [F.col("name") > "zz/"],  # empty result
    ):
        got = cs.load_catalog(spark, path)
        want = objs.select("bucket", "name", "size", "checksum", "version")
        for p in preds:
            got = got.filter(p)
            want = want.filter(p)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )


def test_unhandled_filters_fall_back_to_spark(spark, chunked):
    """A size predicate isn't pushed (non-string attribute): the reader
    must return it as remaining and Spark must still produce exact
    results."""
    path, _, objs = chunked
    r = cs.CatalogReader({"path": path})
    remaining = list(
        r.pushFilters(
            [GreaterThan(("size",), 500), IsNotNull(("name",))]
        )
    )
    assert len(remaining) == 2  # neither handled
    got = (
        cs.load_catalog(spark, path)
        .filter((F.col("size") > 500) & F.col("name").startswith("en/"))
        .collect()
    )
    want = (
        objs.select("bucket", "name", "size", "checksum", "version")
        .filter((F.col("size") > 500) & F.col("name").startswith("en/"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_fully_consumed_filters_not_reapplied_in_plan(spark, chunked):
    """When the reader consumes the name predicates, the physical plan
    keeps only the null check — proof the pushdown is planner-visible,
    not a silent double-evaluation."""
    path, _, _ = chunked
    df = cs.load_catalog(spark, path).filter(F.col("name").startswith("en/"))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan aiscatalog" in plan
    filter_lines = [ln for ln in plan.splitlines() if "Filter " in ln]
    assert all("StartsWith" not in ln for ln in filter_lines), filter_lines


def test_stream_tail_reads_only_new_chunks(spark, sf_dir, tmp_path):
    """readStream over the chunked catalog: the first availableNow run
    drains the initial chunks; after an append, a second run emits
    ONLY the appended rows (offset = manifest index, exactly-once)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "cat")
    objs = objects_catalog(load_table(spark, sf_dir, "documents"))
    first = objs.filter(F.col("doc_id") % 2 == 0)
    second = objs.filter(F.col("doc_id") % 2 == 1)
    cs.write_chunked_catalog(first, path, n_chunks=4)
    cs.register_catalog_source(spark)

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("aiscatalog")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got1 = {r.name for r in spark.read.parquet(out).collect()}
    assert got1 == {r.name for r in first.collect()}

    cs.write_chunked_catalog(second, path, n_chunks=4, append=True)
    drain()
    got2 = {r.name for r in spark.read.parquet(out).collect()}
    assert got2 == {r.name for r in objs.collect()}
    # second drain appended exactly the new rows, no re-reads
    n_rows = spark.read.parquet(out).count()
    assert n_rows == objs.count()


def test_writer_appends_chunks_transactionally(spark, sf_dir, tmp_path):
    """df.write.format('aiscatalog').mode('append'): each task writes
    one sorted chunk, the manifest extends only at commit, and the
    batch reader + stream offsets see exactly the appended rows."""
    path = str(tmp_path / "wcat")
    objs = objects_catalog(load_table(spark, sf_dir, "documents")).select(
        "bucket", "name", "size", "checksum", "version"
    )
    first = objs.filter(F.col("name") < "f")
    second = objs.filter(F.col("name") >= "f")
    cs.register_catalog_source(spark)

    (
        first.repartitionByRange(3, "name")
        .write.format("aiscatalog")
        .option("path", path)
        .mode("append")
        .save()
    )
    got1 = cs.load_catalog(spark, path).collect()
    assert sorted(map(tuple, got1)) == sorted(map(tuple, first.collect()))
    man1 = cs.CatalogReader({"path": path}).chunks
    for c in man1:
        assert c["min_name"] <= c["max_name"] and c["rows"] > 0

    (
        second.repartitionByRange(3, "name")
        .write.format("aiscatalog")
        .option("path", path)
        .mode("append")
        .save()
    )
    got2 = cs.load_catalog(spark, path).collect()
    assert sorted(map(tuple, got2)) == sorted(map(tuple, objs.collect()))
    man2 = cs.CatalogReader({"path": path}).chunks
    # append-only manifest: the first batch's chunks are a stable prefix
    assert man2[: len(man1)] == man1

    # overwrite is refused (stream offsets index the manifest)
    import pytest as _pytest

    with _pytest.raises(Exception, match="append-only"):
        first.write.format("aiscatalog").option("path", path).mode(
            "overwrite"
        ).save()


def test_prefix_successor_handles_astral_plane_names():
    """Regression: prefix+'\\uffff' is not an upper bound for names
    with supplementary-plane characters; the successor bound is."""
    from aistore_spark.sources.catalog_source import _prefix_successor

    assert _prefix_successor("ab") == "ac"
    # U+FFFF increments into the supplementary plane, not to 'b' —
    # "a￿\U0001F600..." must still sit below the bound
    assert _prefix_successor("a￿") == "a\U00010000"
    assert "a￿\U0001F600" < _prefix_successor("a￿")
    assert _prefix_successor("\U0010FFFF") is None
    # an astral name that starts with the prefix must sit BELOW the bound
    assert "ab\U0001F600xyz" < _prefix_successor("ab")
    assert "ab￿￿" < _prefix_successor("ab")


def test_reader_keeps_astral_named_rows(spark, tmp_path):
    """End-to-end: a chunk whose names contain astral characters must
    survive prefix pruning and return its rows."""
    cs.register_catalog_source(spark)
    path = str(tmp_path / "astral")
    rows = [
        ("ais://b", "ab\U0001F600doc", 1, "c1", "1"),
        ("ais://b", "abzz", 2, "c2", "1"),
        ("ais://b", "qq", 3, "c3", "1"),
    ]
    df = spark.createDataFrame(
        rows, "bucket string, name string, size bigint, checksum string, version string"
    )
    cs.write_chunked_catalog(df, path, n_chunks=2)
    got = sorted(
        r.name
        for r in cs.load_catalog(spark, path)
        .filter(F.col("name").startswith("ab"))
        .collect()
    )
    assert got == sorted(["ab\U0001F600doc", "abzz"])


def test_append_ignores_orphan_writer_files(spark, tmp_path):
    """Regression (ADVICE r5): a part-w*.parquet left behind by a
    failed/zombie CatalogWriter task (abort() can only unlink files it
    was told about) must NOT be adopted by a later
    write_chunked_catalog(append=True) — adopting it would resurrect
    uncommitted rows into the manifest."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "orphan")
    schema = (
        "bucket string, name string, size bigint, checksum string, "
        "version string"
    )
    first = spark.createDataFrame(
        [("ais://b", "a", 1, "c", "1"), ("ais://b", "b", 2, "c", "1")], schema
    )
    cs.write_chunked_catalog(first, path, n_chunks=2)

    # plant an orphan writer file (uncommitted task output)
    orphan = pa.table(
        {
            "bucket": ["ais://b"],
            "name": ["zombie"],
            "size": [99],
            "checksum": ["x"],
            "version": ["1"],
        }
    )
    from pathlib import Path

    pq.write_table(orphan, Path(path) / "chunks" / "part-wdeadbeef.parquet")

    second = spark.createDataFrame([("ais://b", "c", 3, "c", "1")], schema)
    manifest = cs.write_chunked_catalog(second, path, n_chunks=1, append=True)
    names = {
        r.name for r in cs.load_catalog(spark, path).collect()
    }
    assert "zombie" not in names
    assert names == {"a", "b", "c"}
    assert not any("part-w" in Path(c["file"]).name for c in manifest["chunks"])


def test_manifest_range_survives_missing_parquet_stats(tmp_path):
    """Regression (ADVICE r5): a chunk whose parquet footer lacks
    min/max statistics must fall back to scanning the name column, not
    crash on `.statistics.min` of None."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    md_dir = tmp_path / "nostats" / "chunks"
    md_dir.mkdir(parents=True)
    t = pa.table(
        {
            "bucket": ["ais://b", "ais://b"],
            "name": ["mm", "aa"],
            "size": [1, 2],
            "checksum": ["c", "c"],
            "version": ["1", "1"],
        }
    )
    f = md_dir / "part-00000-nostats.parquet"
    pq.write_table(t, f, write_statistics=False)
    md = pq.read_metadata(f)
    name_idx = md.schema.names.index("name")
    assert md.row_group(0).column(name_idx).statistics is None
    lo, hi = cs._name_range(md, name_idx, f)
    assert (lo, hi) == ("aa", "mm")


def test_merge_on_read_resolution(spark, tmp_path):
    """read_resolved: latest chunk wins per key, delete tombstones
    drop rows, upsert-after-delete resurrects, and as_of=<manifest
    index> is exactly the state a stream consumer at that offset had
    seen (the m12/s14 time-travel consistency contract)."""
    path = str(tmp_path / "mcat")
    rows = [
        ("b1", f"obj/{i:03d}", 100 + i, f"ck{i}", "1") for i in range(20)
    ]
    base = spark.createDataFrame(rows, cs.CATALOG_SCHEMA)
    man = cs.write_chunked_catalog(base, path, n_chunks=2)
    n_base = len(man["chunks"])

    upd = spark.createDataFrame(
        [("b1", "obj/003", 9003, "ck3b", "2"), ("b1", "obj/999", 7, "new", "1")],
        cs.CATALOG_SCHEMA,
    )
    cs.append_changes(upd, path, op="upsert", n_chunks=1)
    dele = spark.createDataFrame(
        [("b1", "obj/005", 0, "", "1"), ("b1", "obj/003", 0, "", "1")],
        cs.CATALOG_SCHEMA,
    )
    cs.append_changes(dele, path, op="delete", n_chunks=1)

    got = {r.name: (r.size, r.version) for r in
           cs.read_resolved(spark, path).collect()}
    assert "obj/003" not in got and "obj/005" not in got  # delete wins
    assert got["obj/999"] == (7, "1")
    assert got["obj/004"] == (104, "1")
    assert len(got) == 19  # 20 base - 2 deleted + 1 new

    # resurrection: a later upsert of a deleted key wins again
    cs.append_changes(
        spark.createDataFrame(
            [("b1", "obj/005", 55, "ck5c", "3")], cs.CATALOG_SCHEMA
        ),
        path, op="upsert", n_chunks=1,
    )
    got2 = {r.name: (r.size, r.version) for r in
            cs.read_resolved(spark, path).collect()}
    assert got2["obj/005"] == (55, "3")

    # time travel: as_of the base manifest length == the base state
    before = {r.name: (r.size, r.version) for r in
              cs.read_resolved(spark, path, as_of=n_base).collect()}
    assert before == {n: (s, v) for _, n, s, _, v in rows}
    assert cs.read_resolved(spark, path, as_of=0).count() == 0

    # bad op refused before any file lands
    import pytest as _pytest

    with _pytest.raises(Exception, match="upsert.delete"):
        upd.write.format("aiscatalog").option("path", path).option(
            "op", "purge"
        ).mode("append").save()
