"""Selection predicates (F1-F6): how every bulk operation picks objects.

The reference's ``ListRange`` message (``api/apc/multiobj.go:16-28``)
carries either an explicit name list or a brace template; prefix and
regex predicates ride on the individual operations. All of them become
catalog predicates/joins here — and since they're plain column
expressions, Catalyst pushes them into the Parquet scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aistore_spark.functions.templates import (
    expand_template,
    has_fmt_range,
    template_count,
    template_regex,
)
from aistore_spark.util import local_frame

#: archive multi-match modes, cmn/archive/read.go:32-38
ARCH_MODES = ("regexp", "prefix", "suffix", "substr", "wdskey")


def select_prefix(df: DataFrame, prefix: str, name_col: str = "name") -> DataFrame:
    """F1: ``name LIKE 'p%'`` — pushed down to the scan."""
    return df.filter(F.col(name_col).startswith(prefix))


def select_by_template(
    catalog: DataFrame,
    spark: SparkSession,
    template: str,
    name_col: str = "name",
    broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """F2: rows whose name the brace template generates.

    The expansion is a generated DataFrame; small expansions broadcast
    (no shuffle of the catalog), huge ones fall back to a hash join.
    Fmt-style templates (``prefix-%06d-suffix``) are unbounded ranges
    (``cmn/cos/template.go:295-301``) — matched with an anchored regex
    filter instead of an expansion join.
    """
    if has_fmt_range(template):
        return catalog.filter(F.col(name_col).rlike(template_regex(template)))
    names = expand_template(spark, template)
    if template_count(template) <= broadcast_threshold:
        names = F.broadcast(names)
    return catalog.join(names, catalog[name_col] == names["name"], "left_semi")


def select_by_names(
    catalog: DataFrame,
    spark: SparkSession,
    names: Sequence[str],
    name_col: str = "name",
) -> DataFrame:
    """F3: operate on exactly these names (``ListRange.ObjNames``)."""
    return catalog.filter(F.col(name_col).isin(list(names)))


def names_found_report(
    catalog: DataFrame,
    spark: SparkSession,
    names: Sequence[str],
    name_col: str = "name",
) -> DataFrame:
    """F3 companion: per requested name, how many catalog rows matched
    (0 = missing — the reference reports those per-object errors,
    ``xact/xs/lrit.go:227-245``)."""
    req = local_frame(spark, [(n,) for n in names], schema="req_name string")
    # Broadcast the tiny request list into an inner join (one catalog
    # scan, no catalog shuffle), aggregate to per-name counts (tiny),
    # then left-join request-side so missing names report found=0. A
    # direct `req LEFT JOIN catalog` could not broadcast: the preserved
    # side of an outer join cannot be the broadcast build side.
    found = (
        catalog.join(F.broadcast(req), F.col(name_col) == req["req_name"], "inner")
        .groupBy("req_name")
        .agg(F.count("*").alias("found"))
    )
    return req.join(found, "req_name", "left").select(
        "req_name", F.coalesce(F.col("found"), F.lit(0).cast("bigint")).alias("found")
    )


def select_regex(
    df: DataFrame, pattern: str, mode: str = "regexp", name_col: str = "member"
) -> DataFrame:
    """F4: archive multi-match (``archregx`` + ``archmode``).

    Modes per ``cmn/archive/read.go:25-38``: regexp, prefix, suffix,
    substr, and wdskey (match on the WebDataset sample key = name minus
    the last extension).
    """
    col = F.col(name_col)
    if mode == "regexp":
        cond = col.rlike(pattern)
    elif mode == "prefix":
        cond = col.startswith(pattern)
    elif mode == "suffix":
        cond = col.endswith(pattern)
    elif mode == "substr":
        cond = col.contains(pattern)
    elif mode == "wdskey":
        cond = F.regexp_extract(col, r"^(.*)\.[^.]+$", 1) == pattern
    else:
        raise ValueError(f"unknown archmode {mode!r}; expected one of {ARCH_MODES}")
    return df.filter(cond)


def size_dispatch(
    df: DataFrame, threshold: int, size_col: str = "size"
) -> DataFrame:
    """F6: split work by size — prefetch routes objects >= BlobThreshold
    down the parallel blob path (``xact/xs/prefetch.go:176-244``)."""
    return df.withColumn(
        "path",
        F.when(F.col(size_col) >= threshold, F.lit("blob")).otherwise(
            F.lit("regular")
        ),
    )
