"""aistore_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of NVIDIA/aistore (the reference object store
for AI workloads).

The reference (read-only at /root/reference) is a Go object store whose
"query surface" is: metadata listings (list/filter/project/paginate),
bucket & shard summaries, a distributed sort/reshard engine (dsort),
per-object map transforms (ETL), batch assembly (get-batch), archive
pack/unpack, and bulk movement (copy/prefetch/evict/sync).

This package re-expresses every one of those as idiomatic Spark:

- ``catalog``    — the data model: object / shard-member catalog DataFrames
                   (the LsoEnt row type, cmn/objlist.go:25-35)
- ``operators``  — the operator inventory from SURVEY.md §2, each a pure
                   function DataFrame -> DataFrame built on pyspark.sql
- ``functions``  — scalar helpers (brace-template expansion, hashing)
- ``sources``    — readers: parquet catalogs, binaryFile content, archive
                   member expansion
- ``streaming``  — incremental ingest jobs (downloader/sync) as
                   Structured Streaming

Everything here derives from public knowledge: the Apache Spark API and
the reference repo's observable behavior.
"""

__version__ = "0.1.0"
