"""Quickstart: the reference's common workflows on this engine.

Left column of each section: what a user runs against the reference
(`ais` CLI / Python SDK); body: the equivalent here. Run:

    python examples/quickstart.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from aistore_spark.api import BatchLoader, list_bucket
from aistore_spark.catalog import members_catalog, objects_catalog
from aistore_spark.operators import dsort, etl, movement, summary
from aistore_spark.operators.listing import list_objects
from aistore_spark.session import get_spark
from aistore_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("quickstart", cpus=8)
    objects = objects_catalog(load_table(spark, sf_dir, "documents"))
    members = members_catalog(load_table(spark, sf_dir, "lineitem"))

    # ais ls ais://bucket --prefix en/ --props name,size --limit 5
    print("== listing ==")
    list_objects(objects, prefix="en/", page_size=5, props=("name", "size")).show()

    # ais ls --paged (SDK: client.bucket(...).list_objects_iter())
    first_page = next(list_bucket(spark, objects, prefix="de/", page_size=3))
    print("first page:", [r["name"] for r in first_page])

    # ais bucket summary
    print("== bucket summary ==")
    summary.bucket_summary(objects).orderBy("bucket").show(5)

    # ais start dsort '{"algorithm": {"kind": "content", ...}}'
    print("== dsort (content key, 1 MiB shards) ==")
    packed = dsort.run_dsort(
        members, dsort.DsortSpec(algorithm="content", output_shard_size=1 << 20)
    )
    dsort.shard_manifest(packed, item_col="base", size_col="rec_bytes").orderBy(
        "shard_id"
    ).show(5)

    # ais etl init + ais etl bucket src dst (offline transform)
    print("== offline ETL (md5 pipeline, ext remap) ==")
    docs = load_table(spark, sf_dir, "documents").select(
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("name"),
        F.encode("text", "UTF-8").alias("data"),
    )
    etl.etl_offline(docs, ["md5"], prepend="out/", ext_remap={}).select(
        "name", "new_name", F.col("out").cast("string")
    ).show(3, truncate=False)

    # SDK BatchLoader: batch.add(...).get() -> (name, bytes) iterator,
    # mixing plain objects, archived files (archpath) and byte ranges
    # in one request (MossIn, api/apc/ml.go:87-120)
    print("== get-batch (mixed entries) ==")
    some = [r.member for r in members.limit(2).collect()]
    arch = members.limit(1).collect()[0]
    loader = (
        BatchLoader(spark, members)
        .add(*some, "missing.jpg")
        .add_entry(arch.shard, archpath=arch.member)
        .add_entry(some[0], start=0, length=8)
    )
    for name, data in loader.get():
        print(f"  {name}: {None if data is None else len(data)} bytes")

    # ais prefetch / sync (plans)
    print("== prefetch plan rows ==")
    from aistore_spark.catalog import remote_objects_catalog

    remote = remote_objects_catalog(load_table(spark, sf_dir, "documents"))
    local = objects.filter(F.col("doc_id") % 7 != 0)
    print("  to fetch:", movement.prefetch_plan(remote, local).count())

    spark.stop()


if __name__ == "__main__":
    main()
