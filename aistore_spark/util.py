"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Round-robin repartition a frame whose scan under-parallelizes.

    The driver testdata is one parquet file with ONE row group per
    table, so Spark reads it as a single task no matter what
    ``maxPartitionBytes`` says; any CPU-heavy derivation downstream
    (shingling, tar building, UDFs) would run on one core. At real
    scale (many files / row groups) the scan splits naturally and this
    becomes a no-op — it only repartitions when the current partition
    count is below ``parallelism / min_factor``.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * min_factor < target:
        return df.repartition(target)
    return df
