"""Catalog maintenance: the incremental upsert that keeps the
materialized `objects`/`members` catalogs current.

The reference updates per-object metadata in place (LOM writes on every
PUT/version change); a lakehouse catalog does it as periodic MERGE of a
change batch. Without Delta/Iceberg in this runtime, MERGE is emulated
with the standard anti-join + union (SCD-1 semantics): rows in the
update batch supersede same-name rows in the base.

At 100 TB: both sides partitioned by `bucket`; the anti-join shuffles
only the (small) change batch when the base is bucketed by `name` —
or use a real MERGE INTO when a lakehouse format is on the classpath
(gated by import-try in `merge_into`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert_catalog(
    base: DataFrame, updates: DataFrame, key: str = "name"
) -> DataFrame:
    """SCD-1 upsert: updates win on key collision, everything else kept.

    Deterministic: output = updates ∪ (base ∖ updates-by-key).
    """
    survivors = base.join(updates.select(key), key, "left_anti")
    return updates.unionByName(survivors)


def delete_from_catalog(
    base: DataFrame, deletes: DataFrame, key: str = "name"
) -> DataFrame:
    """M3-on-catalog: remove the named rows (delete-objects applied to
    the metadata table)."""
    return base.join(deletes.select(key), key, "left_anti")


def merge_into(spark, base_table: str, updates: DataFrame, key: str = "name"):
    """Real lakehouse MERGE when Delta is available (not in this
    runtime — gated)."""
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "Delta Lake is not on the classpath in this runtime; use "
            "upsert_catalog() + overwrite, or add delta-spark jars"
        ) from exc
    raise NotImplementedError("wire DeltaTable.merge here on deployments")
