"""Task-skew probe over Spark's AppStatusStore (verdict-r12 item 4).

The r11 sf10 sweep found mapInPandas stages whose input splits
inherited a clustered corpus ordering: one task carried 40+ minutes of
work while the rest finished in seconds — caught only by eyeballing
the sweep log. This module automates that class of detection: after a
query runs, read the per-stage task-duration distribution from the
driver's AppStatusStore (works with ``spark.ui.enabled=false`` — no
REST port needed) and report max/median task-duration ratios. bench.py
records the worst ratio per heavy query into the bench artifact;
``tools/bench_compare.py`` flags ratios above its threshold.

Scale rationale: on a 1000-executor cluster a skewed stage wastes the
whole fleet's wall-clock on one straggler — max/median per stage IS
the symptom, independent of cluster size, and reading it from the
status store costs nothing at any scale.

The probe is advisory: any failure (store internals shifted between
Spark versions, stage evicted from the retained window) degrades to
"no reading", never to a failed bench run. Readings taken under heavy
EXTERNAL host load can false-positive — a neighbor process stalling
one task mimics data skew (measured r13: pipe3 read 12x while a
24-thread DuckDB oracle churned beside it, then 1.0-1.06x across
three quiet re-runs). Treat a flag as "re-run this query alone",
not as proof of a plan defect.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def stage_task_skew(
    spark: SparkSession,
    since_epoch_ms: int,
    min_tasks: int = 4,
    min_max_ms: float = 1000.0,
    slack_ms: int = 100,
) -> list[dict]:
    """Max/median task-duration ratio for every COMPLETE stage that
    finished at/after ``since_epoch_ms``.

    Only stages with at least ``min_tasks`` completed tasks and a
    longest task of at least ``min_max_ms`` are reported — a
    2 ms-median / 20 ms-max stage is a 10x ratio with zero
    significance. The median is floored at 1 ms so an all-subsecond
    stage cannot divide by zero.
    """
    out: list[dict] = []
    try:
        sc = spark.sparkContext
        gw = sc._gateway
        store = sc._jsc.sc().statusStore()
        stages = store.stageList(
            gw.jvm.java.util.ArrayList(),  # all statuses
            False,
            False,
            gw.new_array(gw.jvm.double, 0),
            gw.jvm.java.util.ArrayList(),
        )
        quants = gw.new_array(gw.jvm.double, 2)
        quants[0], quants[1] = 0.5, 1.0
        for i in range(stages.size()):
            s = stages.apply(i)
            if s.status().toString() != "COMPLETE":
                continue
            ct = s.completionTime()
            if not ct.isDefined():
                continue
            # small slack: the stage's completion stamp and the
            # caller's clock read race by scheduler-callback latency.
            # Kept tight (100 ms): a wide slack re-reads the PREVIOUS
            # query's final stage when runs are back-to-back
            if ct.get().getTime() < since_epoch_ms - slack_ms:
                continue
            n = s.numCompleteTasks()
            if n < min_tasks:
                continue
            opt = store.taskSummary(s.stageId(), s.attemptId(), quants)
            if not opt.isDefined():
                continue
            dur = opt.get().duration()
            median_ms, max_ms = float(dur.apply(0)), float(dur.apply(1))
            if max_ms < min_max_ms:
                continue
            out.append(
                {
                    "stage": s.stageId(),
                    "attempt": s.attemptId(),
                    "n_tasks": n,
                    "median_ms": round(median_ms, 1),
                    "max_ms": round(max_ms, 1),
                    "ratio": round(max_ms / max(median_ms, 1.0), 2),
                }
            )
    except Exception:  # noqa: BLE001 - advisory probe, never fatal
        return out
    out.sort(key=lambda r: -r["ratio"])
    return out


def worst_task_skew(
    spark: SparkSession,
    since_epoch_ms: int,
    min_tasks: int = 4,
    min_max_ms: float = 1000.0,
) -> dict | None:
    """The single worst stage by max/median ratio, or None."""
    rows = stage_task_skew(spark, since_epoch_ms, min_tasks, min_max_ms)
    return rows[0] if rows else None
