"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[N]`` (one JVM); the configs below are
chosen to also be correct defaults on a real cluster at 100 TB:

- AQE on (runtime coalescing, skew-join splitting) — replaces the
  reference's hand-built concurrency adjuster / memory watcher
  (ext/dsort/conc_adjuster.go, mem_watcher.go).
- shuffle partitions sized to cores locally; on a cluster this should be
  2-3x total executor cores (AQE coalesces down as needed).
- Arrow enabled: every bytes-transform UDF (ETL surface) is a Pandas UDF.
- Session timezone pinned UTC so timestamp semantics are stable across
  engines and clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "aistore_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or min(
            os.cpu_count() or 4, 32
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata's events.ts is parquet TIMESTAMP(NANOS) — Spark has no
        # nanosecond timestamp type; read as int64 nanos (matches the
        # reference's atime representation anyway, cmn/objattrs.go:80-81)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python UDTFs evaluate Arrow-batched (ArrowEvalPythonUDTF),
        # never row-at-a-time — same contract as the Pandas-UDF rule
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
