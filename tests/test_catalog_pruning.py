"""Catalog scan pruning at scale (SURVEY.md §4 item 1).

SCALE.md's claim — a name-sorted, bucket-partitioned parquet catalog
turns S1-style prefix/token listings into a tiny fraction of the scan —
must be MEASURED, not documented. These tests write the deployment
layout (`sources/catalog_store.py`) and assert, from the executed
plan's own metrics, that:

- partition filters prune the file listing to a strict subset
  (``numFiles`` metric vs the layout's total file count);
- data filters are pushed to parquet (``PushedFilters`` in the scan
  node) and the name-sorted layout lets row-group min/max statistics
  skip most of the data (scan ``numOutputRows`` ≪ table rows);
- the parquet footers themselves prove the sorted layout: per-file
  name min/max ranges are disjoint, so only a strict subset of files
  can contain a given prefix.

At 100×: the same layout, more files — pruning ratios IMPROVE with
file count because each file covers a narrower name range.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from aistore_spark.catalog import objects_catalog
from aistore_spark.sources import catalog_store
from aistore_spark.sources.tables import load_table


def _scan_metrics(df) -> dict[str, int]:
    """Metric values of the leftmost file scan of an EXECUTED frame."""
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.executedPlan()
    scan = plan.collectLeaves().apply(0)
    out = {}
    it = scan.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


@pytest.fixture(scope="module")
def catalog_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("catstore") / "objects")
    objs = objects_catalog(load_table(spark, sf_dir, "documents"))
    catalog_store.materialize_objects(objs, path)
    return path


def test_partition_filter_prunes_file_listing(spark, catalog_path):
    """bucket = X must plan a scan over ONLY that partition's files."""
    all_files = spark.read.parquet(catalog_path).inputFiles()
    q = catalog_store.load_objects(spark, catalog_path).filter(
        F.col("bucket") == "ais://src1"
    )
    # collect THIS frame: metrics live on the executed plan of this
    # queryExecution (count() would execute a different one)
    assert len(q.collect()) > 0
    m = _scan_metrics(q)
    # partition dir is URL-encoded (twice in inputFiles output):
    # bucket=ais%253A%252F%252Fsrc1/part-...; the trailing '/' pins
    # src1 vs src10..src19
    part_files = [f for f in all_files if "%252Fsrc1/" in f]
    assert part_files, f"unexpected partition dir names: {all_files[:3]}"
    assert m["numFiles"] == len(part_files) < len(all_files)
    plan_str = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan_str


def test_prefix_filter_pushed_and_rowgroups_skipped(spark, sf_dir, tmp_path):
    """A prefix listing over a name-sorted multi-file catalog must push
    StringStartsWith into the parquet scan and read only the row groups
    whose [min, max] name range can match — measured via the scan's
    numOutputRows, not eyeballed from the plan."""
    path = str(tmp_path / "sorted")
    objs = objects_catalog(load_table(spark, sf_dir, "documents"))
    total = objs.count()
    # the deployment shape for a single-bucket catalog: range-partition
    # by name so each file owns a contiguous name range
    (
        objs.repartitionByRange(8, "name")
        .sortWithinPartitions("name")
        .write.mode("overwrite")
        .parquet(path)
    )
    q = spark.read.parquet(path).filter(F.col("name").startswith("en/"))
    matched = len(q.collect())
    assert 0 < matched < total
    plan_str = q._jdf.queryExecution().executedPlan().toString()
    assert "StringStartsWith(name,en/)" in plan_str.replace("'", "")
    m = _scan_metrics(q)

    # read the parquet footers: because the layout is name-range
    # partitioned, only files whose [min, max] name range intersects
    # 'en/%' can contain matches — count them and their rows
    files = spark.read.parquet(path).inputFiles()
    can_match, rows_in_matchable = 0, 0
    for f in files:
        md = pq.read_metadata(f.removeprefix("file:"))
        name_idx = md.schema.names.index("name")
        lo = min(
            md.row_group(i).column(name_idx).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(name_idx).statistics.max
            for i in range(md.num_row_groups)
        )
        if lo <= "en/￿" and hi >= "en/":
            can_match += 1
            rows_in_matchable += md.num_rows
    assert 0 < can_match < len(files), (
        f"{can_match}/{len(files)} files can match - layout not selective"
    )
    assert rows_in_matchable < total
    # the scan must have skipped every row group OUTSIDE the matchable
    # name ranges: rows it emitted <= rows living in matchable files
    assert m["numOutputRows"] <= rows_in_matchable, (
        f"scan read {m['numOutputRows']} rows but only "
        f"{rows_in_matchable} live in prefix-matchable files - "
        "row-group pruning did not engage"
    )


def test_continuation_token_point_lookup_reads_little(spark, catalog_path):
    """The S1 hot path (prefix + continuation token) over the
    materialized layout: pushed range predicate + partition pruning
    combine so the scan emits a small fraction of the catalog."""
    full = catalog_store.load_objects(spark, catalog_path)
    total = full.count()
    q = full.filter(
        (F.col("bucket") == "ais://src1")
        & F.col("name").startswith("en/")
        & (F.col("name") > "en/src1/000500")
    )
    q.collect()
    m = _scan_metrics(q)
    plan_str = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan_str
    assert "StringStartsWith" in plan_str
    assert m["numOutputRows"] <= total / 2, (
        f"token listing scanned {m['numOutputRows']} of {total} rows"
    )
