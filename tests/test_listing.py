"""Semantic unit tests for the listing operator (S1-S3, S5) — the
property-style checks the reference's own tests use
(ais/test/lso_test.go): pagination covers everything exactly once,
pages are sorted, projection narrows columns."""

from __future__ import annotations

from aistore_spark.catalog import objects_catalog
from aistore_spark.operators.listing import list_objects, list_virtual_dirs
from aistore_spark.sources.tables import load_table


def _objects(spark, sf_dir):
    return objects_catalog(load_table(spark, sf_dir, "documents"))


def test_pagination_is_exhaustive_and_disjoint(spark, sf_dir):
    objects = _objects(spark, sf_dir)
    all_names = [r.name for r in objects.select("name").orderBy("name").collect()]
    token, pages = None, []
    while True:
        page = list_objects(
            objects, continuation_token=token, page_size=37, props=("name",)
        ).collect()
        if not page:
            break
        names = [r.name for r in page]
        assert names == sorted(names), "page must be name-sorted"
        pages.extend(names)
        token = names[-1]
    assert pages == all_names, "pages must cover the catalog exactly once"


def test_prefix_and_presence(spark, sf_dir):
    objects = _objects(spark, sf_dir)
    rows = list_objects(objects, prefix="en/", cached=True).collect()
    assert rows and all(r.name.startswith("en/") and r.cached for r in rows)


def test_virtual_dirs_one_level(spark, sf_dir):
    objects = _objects(spark, sf_dir)
    entries = list_virtual_dirs(objects, "en/").collect()
    assert entries
    for e in entries:
        assert e.entry.startswith("en/")
        assert e.is_dir == e.entry.endswith("/")
        # one-level: no '/' in the middle of the child segment
        child = e.entry[len("en/") :].rstrip("/")
        assert "/" not in child
