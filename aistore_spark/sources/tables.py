"""Parquet table readers for the driver testdata.

At 100 TB scale these would be partitioned parquet/lakehouse tables; the
reads below are plain ``spark.read.parquet`` so Catalyst predicate
pushdown / column pruning / partition pruning apply unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(MICROS) today (reads as
        # TIMESTAMP_NTZ); earlier driver testdata used TIMESTAMP(NANOS),
        # which Spark refuses unless nanos are read as int64. Keep the
        # no-op-on-micros conf so a nanos-era regeneration still loads
        # (tests/test_fixture_schemas.py pins the expected dtypes).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
