"""Binary object content sources: binaryFile reads + archive expansion.

This is the *real-bytes* path (the derived catalogs in catalog.py are
the testdata stand-in): objects come in via Spark's ``binaryFile``
source, and TAR shards are expanded into member rows by reading the
actual archive bytes — the engine's S4 (archive-expanded listing) and
P5 (shard index build) against genuine shards.

Scale: ``binaryFile`` splits by file; expansion is a ``mapInPandas``
flatMap (1 shard in → N member rows out) with no shuffle. Building the
member catalog = expansion + a parquet write, incrementally appendable
per new shard (the reference's index xaction,
``xact/xs/shard_idx.go``). Only member *metadata* (+ optionally bytes)
leaves the task; pass ``with_bytes=False`` to index multi-GB shards
without materializing payloads.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEMBER_SCHEMA = (
    "shard string, member string, offset bigint, size bigint, bytes binary"
)
MEMBER_META_SCHEMA = "shard string, member string, offset bigint, size bigint"


def read_binary_objects(spark: SparkSession, path: str) -> DataFrame:
    """Objects as (path, modificationTime, length, content) rows."""
    return spark.read.format("binaryFile").load(path)


def expand_tar_members(
    binary_df: DataFrame, with_bytes: bool = True
) -> DataFrame:
    """S4/P5: one row per file inside each TAR object.

    ``offset`` is the member's payload offset inside the shard — the
    shard-index datum that makes P2 archpath reads O(1) range-GETs
    (``ais/tgtobj.go:1341-1368``).
    """
    schema = MEMBER_SCHEMA if with_bytes else MEMBER_META_SCHEMA

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "shard": [],
                "member": [],
                "offset": [],
                "size": [],
            }
            if with_bytes:
                out["bytes"] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(content)) as tar:
                    for info in tar.getmembers():
                        if not info.isfile():
                            continue
                        out["shard"].append(path)
                        out["member"].append(info.name)
                        out["offset"].append(info.offset_data)
                        out["size"].append(info.size)
                        if with_bytes:
                            out["bytes"].append(
                                tar.extractfile(info).read()
                            )
            yield pd.DataFrame(out)

    return binary_df.select("path", "content").mapInPandas(expand, schema=schema)


def build_member_index(
    spark: SparkSession, shards_path: str, index_out: str
) -> None:
    """P5: materialize the shard-member index as a parquet catalog —
    the table every P2/P3 extraction query then filters instead of
    scanning tar bytes."""
    members = expand_tar_members(
        read_binary_objects(spark, shards_path), with_bytes=False
    )
    members.write.mode("overwrite").parquet(index_out)
