"""Temporal joins: as-of and range — the classic analytics-engine
operators Spark lacks as built-ins, implemented scale-first.

Beyond-reference (SURVEY.md §7.8 family): the reference stores event
streams as objects; an analytics engine over them needs
point-in-time correctness ("which was the latest state row when this
event happened?") and interval containment ("which events fall inside
this window?").

- as-of join: the naive formulation is a per-left-row MAX over an
  inequality join — quadratic blowup per key. The scale-right shape
  used here is the tagged UNION + per-key running carry: one shuffle
  on the join key, window state bounded per key, zero row explosion.
- range join: the naive formulation is a non-equi theta join (Spark
  falls back to BroadcastNestedLoopJoin). The scale-right shape is
  interval BUCKETIZATION: intervals explode to the fixed-width
  buckets they cover, probes join on (key, bucket) equality, then an
  exact containment filter — a bounded-fanout equi-join Catalyst can
  shuffle-hash.

Determinism contract (oracle-checkable): ties at equal timestamps are
broken by the right row's id (largest wins = "latest"), and the right
row at exactly the probe timestamp IS eligible (inclusive as-of, the
pandas merge_asof / DuckDB ASOF default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join: every *left* row picks the latest *right*
    row of the same *key* with ``right_ts <= left_ts`` (inclusive;
    ties on right_ts broken by the largest right id column order —
    callers get determinism by including an id in *right_cols*).

    Implementation: tag both sides, UNION, and run ONE per-key window
    ordered by ``(ts, is_left, …)`` where right rows sort before left
    rows at equal ts; the carried ``last(right_payload, ignoreNulls)``
    value at each left row is exactly the as-of match. One shuffle on
    *key*, no inequality join, no per-row subquery — the plan a
    1000-executor cluster wants (each key's window state is one
    struct).

    ``tolerance_us``: matches older than ``left_ts - tolerance_us``
    are nulled out (pandas merge_asof tolerance semantics).

    Returns the left rows + ``matched_<col>`` for each right payload
    column + ``match_ts`` (null when no match).
    """
    right_cols = right_cols or []
    payload = F.struct(
        F.col(right_ts).alias("_ts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        payload.alias("_p"),
        F.lit(None).cast("long").alias("_row"),
    )
    lcols = left.columns
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        F.monotonically_increasing_id().alias("_row"),
        *lcols,
    )
    # right rows sort before left rows at equal ts (inclusive as-of);
    # among right rows at equal ts the LAST in (_p) order carries —
    # struct comparison starts at _ts then the payload columns, so
    # callers listing an id column get largest-id-wins determinism.
    u = r.unionByName(l, allowMissingColumns=True)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_is_left"), F.col("_p"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_m", F.last("_p", ignorenulls=True).over(w))
    out = carried.where(F.col("_is_left") == 1)
    if tolerance_us is not None:
        out = out.withColumn(
            "_m",
            F.when(
                F.col("_m._ts") >= F.col("_t") - F.lit(tolerance_us), F.col("_m")
            ),
        )
    sel = list(lcols)
    sel.append(F.col("_m._ts").alias("match_ts"))
    for c in right_cols:
        sel.append(F.col(f"_m.{c}").alias(f"matched_{c}"))
    return out.select(*sel)


def range_join(
    probes: DataFrame,
    intervals: DataFrame,
    key: str,
    probe_ts: str,
    start_col: str,
    end_col: str,
    bucket_us: int,
    interval_cols: list[str] | None = None,
) -> DataFrame:
    """Interval-containment join: every *probes* row matches every
    *intervals* row of the same *key* with ``start <= probe_ts <=
    end`` — WITHOUT the BroadcastNestedLoopJoin a naive non-equi
    condition triggers.

    Bucketization: each interval explodes to the ``bucket_us``-wide
    buckets it covers (``sequence(start div W, end div W)`` —
    fan-out is ``len/W + 1``, bounded when intervals are bounded);
    probes compute their single bucket; the join is a pure equi-join
    on ``(key, bucket)`` followed by the exact containment filter.
    Pick ``bucket_us`` near the typical interval length: fan-out
    stays O(1) and each probe meets only intervals in its own bucket.
    """
    interval_cols = interval_cols or []
    iv = intervals.select(
        F.col(key).alias("_k"),
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
        *interval_cols,
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {bucket_us}"),
                F.expr(f"{end_col} div {bucket_us}"),
            )
        ).alias("_b"),
    )
    pr = probes.withColumn("_pb", F.expr(f"{probe_ts} div {bucket_us}"))
    joined = pr.join(
        iv,
        (pr["_pb"] == iv["_b"]) & (pr[key] == iv["_k"]),
    ).where(
        (F.col(probe_ts) >= F.col("_s")) & (F.col(probe_ts) <= F.col("_e"))
    )
    return joined.drop("_pb", "_b", "_k")
