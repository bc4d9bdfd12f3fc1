"""The engine's data model: catalog DataFrames.

The reference models everything as an *object catalog* — the ``LsoEnt``
row type (``cmn/objlist.go:25-35``: name, checksum, atime, version,
size, copies, flags, custom) — plus a *shard-member* catalog (archive
contents; what ``tools/tarch`` generates and dsort consumes,
``ext/dsort/shard/record.go:41-77``) and *batch request* lists
(``api/apc/ml.go:88-98``).

The driver's testdata is a TPC-H-ish star schema, so these builders
derive the AIStore-shaped catalogs from it **deterministically**. Every
derivation here is mirrored, expression for expression, by an ANSI-SQL
CTE in :mod:`aistore_spark.oracles` so the DuckDB oracle computes the
identical table. If you change one side, change the other.

Determinism / hash-safety rules (both engines must agree bit-for-bit):
- integer arithmetic only for ids/sizes/atimes (atime is int64
  unix-nanos, exactly like the reference — ``cmn/objattrs.go:80-81``);
- ``md5`` for checksums (identical lowercase hex in Spark and DuckDB);
- money values are exact 2-decimal doubles in the testdata, so
  ``round(x*100)`` → BIGINT is unambiguous;
- no floating-point aggregation inside the derivations.

At 100 TB these catalogs are materialized, partitioned Parquet tables
(bucketed by ``bucket``/``shard``) maintained incrementally; here they
are cheap derived views — the operator code downstream is identical
either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from aistore_spark.util import local_frame

# 2025-01-01T00:00:00Z in unix-nanos; objects get 1-minute-spaced atimes.
ATIME_EPOCH_NS = 1735689600000000000
ATIME_STEP_NS = 60000000000


def objects_catalog(documents: DataFrame) -> DataFrame:
    """Object catalog (LsoEnt rows) derived from the ``documents`` table.

    One object per document: hierarchical name ``<lang>/<source>/<id>.txt``
    (multi-level so prefix listing / virtual directories are exercised),
    size from ``n_chars``, content checksum ``md5(text)``, a small cyclic
    version, and a ~70% ``cached`` presence bit (the reference's
    ``LsCached`` flag, ``api/apc/lsmsg.go:23,66``).
    """
    d = F.col("doc_id")
    return documents.select(
        F.concat(F.lit("ais://"), F.col("source")).alias("bucket"),
        F.concat(
            F.col("lang"),
            F.lit("/"),
            F.col("source"),
            F.lit("/"),
            F.lpad(d.cast("string"), 6, "0"),
            F.lit(".txt"),
        ).alias("name"),
        F.col("n_chars").cast("bigint").alias("size"),
        F.md5(F.col("text")).alias("checksum"),
        (F.lit(ATIME_EPOCH_NS) + d * F.lit(ATIME_STEP_NS)).alias("atime_ns"),
        (F.lit(1) + d % 3).cast("string").alias("version"),
        (F.lit(1) + d % 3).cast("bigint").alias("copies"),
        # presence bit from the content hash (~69% true) — must not
        # correlate with bucket (source == doc_id%20 in the testdata,
        # so a doc_id-mod bit would make whole buckets cached)
        (F.substring(F.md5(F.col("text")), 1, 1) <= "a").alias("cached"),
        F.create_map(
            F.lit("ETag"), F.md5(F.col("text")),
            F.lit("source"), F.col("source"),
        ).alias("custom"),
        d.alias("doc_id"),
        F.col("lang"),
        F.col("source"),
    )


def remote_objects_catalog(documents: DataFrame) -> DataFrame:
    """Remote-backend view of the same bucket, for diff/prefetch/sync.

    Deterministic divergence from the local catalog:
    - objects with ``doc_id % 5 == 0`` were deleted remotely;
    - objects with ``doc_id % 11 == 0`` have a bumped remote version.
    (The *local* side of those queries excludes ``doc_id % 7 == 0`` —
    applied by the operators, not here — giving remote-only rows too.)
    """
    d = F.col("doc_id")
    bump = F.when(d % 11 == 0, 1).otherwise(0)
    return (
        documents.filter(d % 5 != 0)
        .select(
            F.concat(F.lit("ais://"), F.col("source")).alias("bucket"),
            F.concat(
                F.col("lang"),
                F.lit("/"),
                F.col("source"),
                F.lit("/"),
                F.lpad(d.cast("string"), 6, "0"),
                F.lit(".txt"),
            ).alias("name"),
            F.col("n_chars").cast("bigint").alias("size"),
            (F.lit(1) + d % 3 + bump).cast("string").alias("version"),
            d.alias("doc_id"),
        )
    )


def members_catalog(lineitem: DataFrame) -> DataFrame:
    """Shard-member catalog: archive contents in the ``tools/tarch`` shape.

    Each lineitem row becomes one archived file. Files sharing a base
    name across extensions (``.jpg``/``.cls``/``.xml``) form one *record*
    (sample) — the WebDataset convention the reference's dsort groups by
    (``ext/dsort/shard/record.go:41-77``). Sort keys of all three dsort
    content-key types (``ext/dsort/shard/key.go:22-26``) ride along:
    int (cents of extendedprice), float (extendedprice), string.
    """
    ok = F.col("l_orderkey")
    ln = F.col("l_linenumber")
    base = F.concat(F.lit("rec-"), F.lpad(ok.cast("string"), 9, "0"))
    ext = (
        F.when(ln % 3 == 0, "jpg").when(ln % 3 == 1, "cls").otherwise("xml")
    )
    return lineitem.select(
        F.lit("ais://shards").alias("bucket"),
        F.concat(
            F.lit("shard-"), F.lpad((ok % 128).cast("string"), 5, "0"), F.lit(".tar")
        ).alias("shard"),
        base.alias("base"),
        ext.alias("ext"),
        F.concat(base, F.lit("."), ext).alias("member"),
        (F.col("l_quantity").cast("bigint") * 1024 + ln).alias("size"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("key_int"),
        F.col("l_extendedprice").alias("key_float"),
        F.concat(
            F.col("l_returnflag"), F.col("l_linestatus"), F.lit("-"), base
        ).alias("key_str"),
        ok.alias("orderkey"),
        ln.cast("bigint").alias("linenumber"),
    )


def fshare_files(documents: DataFrame) -> DataFrame:
    """File-share listing for promote (S9): the walked source tree of
    ``apc.PromoteArgs{SrcFQN}`` (``api/apc/promote.go:10-22``).

    One ``.txt`` per document at the object-naming rel-path (these
    collide with existing objects — the OverwriteDst branch) plus a
    ``.json`` sidecar for every 4th doc (not in any bucket — the
    plain-PUT branch).  Sidecar size is a deterministic function of the
    doc so byte accounting is cross-engine exact.
    """
    d = F.col("doc_id")
    rel = F.concat(
        F.col("lang"),
        F.lit("/"),
        F.col("source"),
        F.lit("/"),
        F.lpad(d.cast("string"), 6, "0"),
    )
    txt = documents.select(
        F.concat(rel, F.lit(".txt")).alias("rel_path"),
        F.col("n_chars").cast("bigint").alias("size"),
    )
    sidecar = documents.filter(d % 4 == 0).select(
        F.concat(rel, F.lit(".json")).alias("rel_path"),
        F.expr("n_chars div 10 + 2").cast("bigint").alias("size"),
    )
    return txt.unionByName(sidecar)


def batch_requests(events: DataFrame) -> DataFrame:
    """Get-batch request list (``MossReq.In[]``, ``api/apc/ml.go:88-98``).

    One request per event, in ``req_idx`` order (the output-order
    contract, ``api/apc/ml.go:26-28``). Requested names spread over a
    20000-wide id space vs ~15000 existing records, so a deterministic
    ~25% misses exercise the ``__404__`` sentinel path.
    """
    rid = (F.col("user_id") * 131 + F.col("event_id") * 7) % 20000
    return events.select(
        F.col("event_id").alias("req_idx"),
        F.lit("ais://shards").alias("bucket"),
        F.concat(
            F.lit("rec-"), F.lpad(rid.cast("string"), 9, "0"), F.lit(".jpg")
        ).alias("objname"),
    )


def mixed_batch_requests(events: DataFrame) -> DataFrame:
    """Mixed-kind get-batch request list: every ``MossIn`` entry type in
    one batch (``api/apc/ml.go:87-120``).

    Kind by ``event_id % 3``:
    - 0 — plain object (``rec-<rid>.jpg``, no range);
    - 1 — archived file: ``objname`` is the shard, ``archpath`` the
      member (``.cls``);
    - 2 — ranged read; odd ``user_id`` ranges an archived file
      (``.xml``), even a plain object. ``rlength`` is -1 (open-ended)
      every 5th request, else a positive multiple of 4096; ``rstart``
      spreads past typical member sizes so ErrRangeNotSatisfiable rows
      occur naturally.

    Requested ids spread over a 20000-wide space vs ~15000 existing
    records, so every kind has deterministic misses.
    """
    rid = (F.col("user_id") * 131 + F.col("event_id") * 7) % 20000
    kind = F.col("event_id") % 3
    is_arch = (kind == 1) | ((kind == 2) & (F.col("user_id") % 2 == 1))
    rec = F.concat(F.lit("rec-"), F.lpad(rid.cast("string"), 9, "0"))
    shard = F.concat(
        F.lit("shard-"), F.lpad((rid % 128).cast("string"), 5, "0"), F.lit(".tar")
    )
    return events.select(
        F.col("event_id").alias("req_idx"),
        F.lit("ais://shards").alias("bucket"),
        F.when(is_arch, shard).otherwise(F.concat(rec, F.lit(".jpg"))).alias(
            "objname"
        ),
        F.when(
            is_arch,
            F.concat(rec, F.lit("."), F.when(kind == 1, "cls").otherwise("xml")),
        )
        .otherwise(F.lit(""))
        .alias("archpath"),
        F.when(kind == 2, (F.col("event_id") * 17) % 40960)
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("rstart"),
        F.when(
            kind == 2,
            F.when(F.col("event_id") % 5 == 0, F.lit(-1)).otherwise(
                (1 + F.col("event_id") % 7) * 4096
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("rlength"),
    )


# External key map (dsort EKM, ext/dsort/shard/key.go:55-60): regex over a
# record's base name -> destination shard template, first match by
# priority. Patterns stay in the regex subset shared by Java (Spark
# rlike) and RE2 (DuckDB regexp_matches). Records matching no pattern
# hit the missing-key policy.
EKM_RULES: list[tuple[str, str, int]] = [
    ("^rec-000000", "ekm-low-%d.tar", 1),
    ("^rec-00000[12]", "ekm-mid-%d.tar", 2),
    ("^rec-0000[0-9]", "ekm-high-%d.tar", 3),
]


def ekm_table(spark: SparkSession) -> DataFrame:
    return local_frame(
        spark, EKM_RULES, schema="pattern string, template string, priority int"
    )
