"""Bulk movement / lifecycle operators (M1-M10, F5).

These are the reference's copy / prefetch / evict / delete / sync
xactions, re-expressed as catalog queries: the *plan* (which objects
move/die and where to) is a DataFrame; executing it is a write job over
that frame. Planning is where all the query semantics live, so the
plans are what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from aistore_spark.util import local_frame


def copy_plan(
    objects: DataFrame,
    prefix: str | None = None,
    prepend: str = "",
    ext_remap: dict[str, str] | None = None,
) -> DataFrame:
    """M1/T2 naming: copy-bucket plan with prefix filter, destination
    prepend and extension remap (``api/apc/tcbtco.go:22-43,97-110``).

    Dry-run (``CopyBckMsg.DryRun``) = aggregate this plan instead of
    executing it.
    """
    df = objects
    if prefix:
        df = df.filter(F.col("name").startswith(prefix))
    new_name = F.concat(F.lit(prepend), F.col("name"))
    for old, new in (ext_remap or {}).items():
        # reference Ext remap: replace the trailing extension
        new_name = F.when(
            F.col("name").endswith(old),
            F.concat(
                F.lit(prepend),
                F.expr(f"substring(name, 1, length(name) - {len(old)})"),
                F.lit(new),
            ),
        ).otherwise(new_name)
    return df.select(
        F.col("name"), new_name.alias("new_name"), F.col("size"), F.col("bucket")
    )


def prefetch_plan(
    remote: DataFrame, local: DataFrame, blob_threshold: int | None = None
) -> DataFrame:
    """M2: warm the cluster from remote — fetch whatever is remote but
    not already cached (``api/apc/multiobj.go:83-107``,
    ``xact/xs/prefetch.go:176-244``). Anti-join; objects at/above
    ``blob_threshold`` take the parallel blob path (F6).

    Scale note: both sides are name-sorted catalogs; the anti-join
    shuffles on ``name`` once. With bucketed catalogs it is shuffle-free.
    """
    cached_names = local.filter(F.col("cached")).select("name")
    plan = remote.join(cached_names, "name", "left_anti")
    if blob_threshold is not None:
        plan = plan.withColumn(
            "path",
            F.when(F.col("size") >= blob_threshold, F.lit("blob")).otherwise(
                F.lit("regular")
            ),
        )
    return plan


def evict_delete_plan(objects: DataFrame, prefix: str | None = None) -> DataFrame:
    """M3: evict vs delete accounting for a selection
    (``api/apc/multiobj.go:29-46``): evict drops only cached copies,
    delete removes everything.
    """
    df = objects
    if prefix:
        df = df.filter(F.col("name").startswith(prefix))
    return df.groupBy("cached").agg(
        F.count("*").alias("n_objects"), F.sum("size").alias("bytes")
    )


def sync_prune_plan(local: DataFrame, remote: DataFrame) -> DataFrame:
    """M10/F5 synchronize: delete destination objects that no longer
    exist at the source (``api/apc/tcbtco.go:33-40``,
    ``xact/xs/prune.go``). Left-anti join of dst against src names.
    """
    return local.join(remote.select("name"), "name", "left_anti").select(
        "name", "size"
    )


def latest_version_plan(local: DataFrame, remote: DataFrame) -> DataFrame:
    """F5 latest-ver: objects whose remote version is newer than the
    cached copy — these get re-fetched (``api/apc/multiobj.go:101-104``).
    """
    rem = remote.select(F.col("name"), F.col("version").alias("remote_version"))
    return (
        local.join(rem, "name", "inner")
        .filter(
            F.col("remote_version").cast("bigint") > F.col("version").cast("bigint")
        )
        .select("name", "version", "remote_version")
    )


def rename_objects_plan(
    objects: DataFrame,
    prefix: str,
    new_prefix: str,
    n_targets: int = 8,
) -> DataFrame:
    """M6b: object rename plan — the ``rename-obj`` verb
    (``api/apc/actmsg.go:62`` ActRenameObject; exec ``ais/tgtobj.go``
    object-move path), bulk form: every object under *prefix* is
    renamed to *new_prefix* + remainder.

    Unlike bucket rename (M6, pure metadata), renaming an OBJECT
    changes its HRW placement key, so the plan carries the re-placement
    delta: the md5 rendezvous owner under the old and the new name, and
    whether the bytes must move (``moved``) — the reference's rename is
    exactly a same-bucket move through the placement function.

    Scale shape: one broadcast of the target set, both owners computed
    in a single max(struct)-pair aggregation keyed by name (map-side
    combined, one row per object into the shuffle); no window, no
    second pass.
    """
    spark = objects.sparkSession
    tdf = local_frame(
        spark, [(t,) for t in range(n_targets)], "target bigint"
    )
    renamed = objects.filter(F.col("name").startswith(prefix)).select(
        "name",
        F.concat(
            F.lit(new_prefix),
            F.expr(f"substring(name, {len(prefix) + 1})"),
        ).alias("new_name"),
    )
    scored = renamed.crossJoin(F.broadcast(tdf)).select(
        "name",
        "new_name",
        "target",
        F.md5(
            F.concat(F.col("name"), F.lit("#"), F.col("target").cast("string"))
        ).alias("ho"),
        F.md5(
            F.concat(F.col("new_name"), F.lit("#"), F.col("target").cast("string"))
        ).alias("hn"),
    )
    owner = scored.groupBy("name", "new_name").agg(
        F.max(F.struct("ho", "target")).alias("o"),
        F.max(F.struct("hn", "target")).alias("n"),
    )
    return owner.select(
        "name",
        "new_name",
        F.col("o.target").alias("src_target"),
        F.col("n.target").alias("dst_target"),
        (F.col("o.target") != F.col("n.target")).alias("moved"),
    )


def promote_plan(
    files: DataFrame,
    objects: DataFrame,
    overwrite_dst: bool = False,
    delete_src: bool = False,
    recursive: bool = True,
    n_targets: int = 8,
) -> DataFrame:
    """S9: promote — ingest file-share files as objects
    (``apc.PromoteArgs``, ``api/apc/promote.go:10-22``).

    *files* is the walked source tree ``(rel_path, size)``; the dest
    object name is the rel path.  Classification against the existing
    catalog: ``put`` (new), ``overwrite`` (exists, ``OverwriteDst``),
    ``skip_exists`` (exists otherwise).  ``Recursive=false`` keeps only
    top-level files; ``DeleteSrc`` marks sources for removal after a
    successful promote.  Since the source is a file share equally
    visible to all targets (``SrcIsNotFshare=false``), each file is
    promoted by its HRW owner — computed here so the plan is already
    per-target work lists.

    Scale shape: one name-keyed left join against the catalog (anti-join
    semantics; shuffle-free with bucketed catalogs) + the broadcast HRW
    owner aggregation. No window, no collect.
    """
    from aistore_spark.operators.placement import hrw_owner

    f = files if recursive else files.filter(~F.col("rel_path").contains("/"))
    dest = f.select(F.col("rel_path").alias("name"), "size")
    exists = objects.select("name").distinct().withColumn("_ex", F.lit(True))
    j = dest.join(exists, "name", "left")
    action = (
        F.when(F.col("_ex").isNotNull() & F.lit(overwrite_dst), "overwrite")
        .when(F.col("_ex").isNotNull(), "skip_exists")
        .otherwise("put")
    )
    classified = j.select(
        "name",
        "size",
        action.alias("action"),
        (F.lit(delete_src) & (action != F.lit("skip_exists"))).alias(
            "delete_after"
        ),
    )
    return hrw_owner(classified, list(range(n_targets)))


def blob_chunk_plan(
    objects: DataFrame,
    chunk_size: int = 4 * 1024 * 1024,
    min_bytes_per_worker: int = 256 * 1024 * 1024,
    max_workers: int = 32,
    size_threshold: int = 0,
) -> DataFrame:
    """S11: blob-download chunk plan — one large object fetched as
    parallel range-read chunks with ordered reassembly
    (``xact/xs/blob_download.go:44-55``: default chunk 4 MiB, >= 256
    MiB of object data per worker, hard cap 32 workers/job).

    Per eligible object (``size >= size_threshold``, mirroring the
    prefetch ``BlobThreshold`` dispatch, F6): one row per chunk with
    byte offsets (last chunk short) and the worker that reads it —
    round-robin over the ordered chunk stream, exactly the
    coordinator's ``roff``-ordered handout.

    Scale shape: generate-and-explode inside the scan's partitions —
    zero shuffles; the plan is embarrassingly parallel at any corpus
    size.
    """
    n_workers = F.least(
        F.lit(max_workers),
        F.greatest(F.lit(1), F.expr(f"size div {min_bytes_per_worker}")),
    ).cast("bigint")
    return (
        objects.filter(F.col("size") >= size_threshold)
        .select(
            "bucket",
            "name",
            "size",
            n_workers.alias("n_workers"),
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.expr(f"(size + {chunk_size - 1}) div {chunk_size}") - 1,
                )
            ).alias("chunk_id"),
        )
        .select(
            "bucket",
            "name",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            (F.col("chunk_id") * chunk_size).cast("bigint").alias("chunk_start"),
            F.least(
                F.lit(chunk_size), F.col("size") - F.col("chunk_id") * chunk_size
            )
            .cast("bigint")
            .alias("chunk_len"),
            (F.col("chunk_id") % F.col("n_workers")).cast("bigint").alias("worker"),
        )
    )


def mpu_plan(
    content: DataFrame,
    part_size: int,
    name_col: str = "name",
    content_col: str = "content",
) -> DataFrame:
    """S12: multipart-upload completion plan (``api/mpt.go:163-203``:
    upload parts by number, complete with the ordered part list).

    Splits each object's *content* into ``part_size``-byte parts and
    produces the completion record: deterministic ``upload_id``,
    ``n_parts``, per-part-checksummed composite ``etag`` — md5 of the
    concatenated part-md5 hex digests suffixed with ``-<n_parts>``,
    the S3 multipart ETag convention — so the oracle match transitively
    verifies every part boundary and every part checksum.

    Scale shape: parts explode inside the scan's partitions; the only
    shuffle is the per-object rollup (keyed by object name — the same
    key the scan is laid out on, map-side combinable). At real scale
    parts stream via the S3A committer; this plan is the bookkeeping
    the committer would do.
    """
    parts = content.select(
        F.col(name_col).alias("name"),
        F.length(content_col).cast("bigint").alias("size"),
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.expr(f"(length({content_col}) + {part_size - 1}) div {part_size}")
                - 1,
            )
        ).alias("part_idx"),
        F.col(content_col).alias("_c"),
    ).select(
        "name",
        "size",
        (F.col("part_idx") + 1).cast("bigint").alias("part_number"),
        F.md5(
            F.substring(
                F.col("_c"), (F.col("part_idx") * part_size + 1).cast("int"), part_size
            )
        ).alias("part_md5"),
    )
    return parts.groupBy("name", "size").agg(
        F.md5(F.concat(F.lit("mpu:"), F.col("name"))).alias("upload_id"),
        F.count("*").cast("bigint").alias("n_parts"),
        F.concat(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("part_number", "part_md5"))
                        ),
                        lambda s: s["part_md5"],
                    ),
                    "",
                )
            ),
            F.lit("-"),
            F.count("*").cast("string"),
        ).alias("etag"),
    )
