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
