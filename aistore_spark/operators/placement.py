"""Data-placement planning operators (M5 LRU, M7 rebalance, M8 mirror/EC).

The reference runs these as storage xactions (``space/lru.go``,
``reb/globrun.go``, ``mirror/makencopies.go``, ``ec/putjogger.go``); the
query semantics — WHICH objects move/die/replicate and WHERE to — are
pure catalog computations, planned here as DataFrames the same way the
M1-M10 movement plans are.  Executing a plan is a write job over it.

All placement uses the engine-portable md5 rendezvous weight
``md5(name # target)`` (argmax == HRW owner, descending ranks == the
reference's ``HrwTargetList``, ``core/meta/hrw.go:23-57,157-181``) so
every plan is hash-exact checkable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aistore_spark.util import local_frame, md5_bucket


def _hrw_scored(
    objects: DataFrame, targets: list[int], cols: tuple[str, ...] = ("size",)
) -> DataFrame:
    """(name, *cols, target, h) for every object x target — the
    rendezvous score table. Targets broadcast; the corpus side never
    shuffles for scoring."""
    spark = objects.sparkSession
    tdf = local_frame(spark, [(t,) for t in targets], "target bigint")
    return (
        objects.select("name", *cols)
        .crossJoin(F.broadcast(tdf))
        .select(
            "name",
            *cols,
            "target",
            F.md5(
                F.concat(F.col("name"), F.lit("#"), F.col("target").cast("string"))
            ).alias("h"),
        )
    )


def hrw_owner(
    df: DataFrame, targets: list[int], name_col: str = "name"
) -> DataFrame:
    """Append ``owner_target`` — the HRW owner of ``name_col`` over
    *targets* (argmax of the md5 rendezvous weight; one max(struct)
    aggregation keyed by name, map-side combined)."""
    spark = df.sparkSession
    tdf = local_frame(spark, [(t,) for t in targets], "target bigint")
    scored = df.crossJoin(F.broadcast(tdf)).withColumn(
        "_h",
        F.md5(
            F.concat(F.col(name_col), F.lit("#"), F.col("target").cast("string"))
        ),
    )
    others = [c for c in df.columns if c != name_col]
    owner = scored.groupBy(name_col).agg(
        F.max(F.struct("_h", "target")).alias("_m"),
        *[F.min(c).alias(c) for c in others],
    )
    return owner.select(
        name_col, *others, F.col("_m.target").alias("owner_target")
    )


def hrw_placement_xxhash(objects: DataFrame, n_targets: int = 8) -> DataFrame:
    """J4 production form: rendezvous placement with Spark's native
    ``xxhash64`` weight (argmax over targets, ``core/meta/hrw.go:23-57``)
    — the hash stays inside whole-stage codegen, no md5 string
    materialization. xxhash64 is engine-internal (not reproducible in
    the DuckDB oracle), so the cross-engine-checkable registered query
    is the md5-weighted ``j4b_hrw_md5``; this form's semantics (balance,
    minimal disruption) are property-tested in ``tests/test_hrw.py``.

    Scale shape: targets broadcast, owner via one max(struct)
    aggregation keyed by name — map-side combined, one row per object
    into the shuffle; final rollup is n_targets rows.
    """
    spark = objects.sparkSession
    targets = spark.range(n_targets).select(F.col("id").alias("target"))
    scored = (
        objects.select("name")
        .crossJoin(F.broadcast(targets))
        .select(
            "name", "target", F.xxhash64(F.col("name"), F.col("target")).alias("h")
        )
    )
    owner = scored.groupBy("name").agg(
        F.max(F.struct("h", "target")).alias("m")
    )
    return (
        owner.select(F.col("m.target").alias("target"))
        .groupBy("target")
        .agg(F.count("*").alias("n_objects"))
    )


def lru_evict_plan(
    objects: DataFrame,
    n_mpaths: int = 4,
    high_wm: int = 90,
    low_wm: int = 75,
) -> DataFrame:
    """M5: LRU eviction plan — ``space/lru.go:33-46``.

    Per mountpath (objects placed by the A4 name-hash), when used
    capacity exceeds ``high_wm``% the jogger evicts oldest-atime-first
    until used drops below ``low_wm``% (``config.Space.{Low,High}WM``,
    ``cmn/config.go:464-471``).  Capacity is normalized to the
    all-mountpath mean used bytes, so the trigger fires (and the plan is
    non-vacuous) at every SF.  All threshold math is integer
    (``100*x <=> wm*capacity`` cross-multiplied) — cross-engine exact.

    Scale shape: the capacity scalar is a broadcast 1-row aggregate (no
    single-partition window); the eviction cumsum runs in a window
    partitioned by mountpath — exactly the reference's
    one-jogger-per-mountpath parallelism (``space/lru.go:84-87``);
    per-partition volume is objects/mountpaths, bounded on a real
    cluster by what one disk holds.  Only ``cached`` objects occupy
    capacity (eviction == drop the cached copy, metadata stays).
    """
    placed = objects.filter(F.col("cached")).select(
        F.concat(
            F.lit("mp-"), md5_bucket("name", n_mpaths).cast("string")
        ).alias("mountpath"),
        "name",
        "size",
        "atime_ns",
    )
    capacity = placed.agg(
        F.expr(f"sum(size) div {n_mpaths}").alias("capacity")
    )
    cum = F.sum("size").over(
        Window.partitionBy("mountpath")
        .orderBy("atime_ns", "name")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    used = F.sum("size").over(Window.partitionBy("mountpath"))
    scored = placed.crossJoin(F.broadcast(capacity)).select(
        "mountpath",
        "name",
        "size",
        "capacity",
        used.alias("used"),
        cum.alias("cum_freed"),
    )
    evict = scored.filter(
        (F.col("used") * 100 > F.col("capacity") * F.lit(high_wm))
        & (
            (F.col("cum_freed") - F.col("size")) * 100
            < F.col("used") * 100 - F.col("capacity") * F.lit(low_wm)
        )
    )
    return evict.groupBy("mountpath").agg(
        F.count("*").alias("n_evicted"),
        F.sum("size").alias("bytes_freed"),
        F.min("used").alias("used_before"),
        (F.min("used") - F.sum("size")).alias("used_after"),
        F.md5(
            F.array_join(F.sort_array(F.collect_list("name")), ",")
        ).alias("names_md5"),
    )


def rebalance_plan(
    objects: DataFrame,
    old_targets: list[int],
    new_targets: list[int],
) -> DataFrame:
    """M7: global rebalance plan — which objects move where when the
    target set changes (``reb/globrun.go``; placement recompute per
    ``core/meta/hrw.go:23-57``).

    One scoring pass over the union of both target sets, one
    aggregation computing the HRW owner under each set (max(struct) —
    map-side combine, one row per object into the shuffle, no window);
    an object moves iff the owners differ.  Target-add-only changes
    exhibit the rendezvous minimal-movement property: every
    destination is a new target.
    """
    union = sorted(set(old_targets) | set(new_targets))
    scored = _hrw_scored(objects, union)
    old_set, new_set = sorted(set(old_targets)), sorted(set(new_targets))
    owner = scored.groupBy("name").agg(
        F.max(
            F.when(F.col("target").isin(old_set), F.struct("h", "target"))
        ).alias("o"),
        F.max(
            F.when(F.col("target").isin(new_set), F.struct("h", "target"))
        ).alias("n"),
        F.min("size").alias("size"),
    )
    moved = owner.filter(F.col("o.target") != F.col("n.target")).select(
        "name",
        "size",
        F.col("o.target").alias("src_target"),
        F.col("n.target").alias("dst_target"),
    )
    return moved.groupBy("src_target", "dst_target").agg(
        F.count("*").alias("n_objects"),
        F.sum("size").alias("bytes_moved"),
        F.md5(
            F.array_join(F.sort_array(F.collect_list("name")), ",")
        ).alias("names_md5"),
    )


def mirror_plan(objects: DataFrame, n_targets: int = 8) -> DataFrame:
    """M8 (mirror): make-n-copies plan — ``mirror/makencopies.go``.

    Each object's configured ``copies`` count (bucket mirror config)
    is satisfied on the top-``copies`` HRW targets
    (``HrwTargetList``, ``core/meta/hrw.go:157-181``); rank 1 is the
    main replica, ranks 2..copies are the additional copies this plan
    creates.  Ranking is one partial-aggregable collect per name (the
    per-name group is the small constant ``n_targets``) + an in-array
    sort/slice — no window sort exchange over the name x target
    product.
    """
    scored = _hrw_scored(objects, list(range(n_targets)), cols=("size", "copies"))
    tops = scored.groupBy("name").agg(
        F.min("size").alias("size"),
        F.min("copies").alias("copies"),
        F.slice(
            F.sort_array(
                F.collect_list(F.struct(F.col("h"), F.col("target"))), asc=False
            ),
            2,
            n_targets - 1,
        ).alias("tops"),
    )
    ranked = tops.select(
        "name",
        "size",
        F.posexplode(F.slice("tops", 1, F.col("copies") - 1)).alias("_p", "_t"),
    ).select(
        "name",
        "size",
        (F.col("_p") + 2).alias("rank"),
        F.col("_t.target").alias("target"),
    )
    return ranked.groupBy("target").agg(
        F.count("*").alias("n_copies"),
        F.sum("size").alias("bytes_mirrored"),
        F.md5(
            F.array_join(
                F.sort_array(
                    F.collect_list(
                        F.concat("name", F.lit("@"), F.col("rank").cast("string"))
                    )
                ),
                ",",
            )
        ).alias("placement_md5"),
    )


def ec_plan(
    objects: DataFrame,
    data_slices: int = 4,
    parity_slices: int = 2,
    obj_size_limit: int = 256,
    n_targets: int = 8,
) -> DataFrame:
    """M8 (EC): erasure-coding placement plan — ``ec/putjogger.go``.

    Objects >= ``obj_size_limit`` are split into D data + P parity
    slices of ``SliceSize = ceil(size/D)`` bytes (``ec/ec.go:308-311``)
    placed on the D+P next-ranked HRW targets after the main (ranks
    2..D+P+1); smaller objects get P full replicas instead (the
    mirroring branch of ``cmn/config.go:217-240`` ``ObjSizeLimit``).

    Scale shape: ranking is one partial-aggregable collect per name
    (group size = the small constant ``n_targets``) + in-array
    sort/slice — no window sort exchange; pieces explode straight out
    of the slice, so nothing shuffles before the final per-(target,
    kind) rollup.
    """
    k = data_slices + parity_slices
    scored = _hrw_scored(objects, list(range(n_targets)))
    is_ec = F.col("size") >= obj_size_limit
    n_pieces = F.when(is_ec, F.lit(k)).otherwise(F.lit(parity_slices))
    piece_bytes = F.when(
        is_ec, F.expr(f"(size + {data_slices} - 1) div {data_slices}")
    ).otherwise(F.col("size"))
    tops = scored.groupBy("name").agg(
        F.min("size").alias("size"),
        F.slice(
            F.sort_array(
                F.collect_list(F.struct(F.col("h"), F.col("target"))), asc=False
            ),
            2,
            k,
        ).alias("tops"),
    )
    ranked = (
        tops.select(
            "name",
            "size",
            F.posexplode(F.slice("tops", 1, n_pieces)).alias("_p", "_t"),
        )
        .select(
            "name",
            "size",
            (F.col("_p") + 2).alias("rank"),
            F.col("_t.target").alias("target"),
        )
        .select(
            "name",
            "target",
            F.when(~is_ec, F.lit("replica"))
            .when(F.col("rank") <= data_slices + 1, F.lit("data"))
            .otherwise(F.lit("parity"))
            .alias("kind"),
            piece_bytes.alias("piece_bytes"),
        )
    )
    return ranked.groupBy("target", "kind").agg(
        F.count("*").alias("n_pieces"),
        F.sum("piece_bytes").alias("bytes"),
        F.md5(
            F.array_join(F.sort_array(F.collect_list("name")), ",")
        ).alias("names_md5"),
    )
