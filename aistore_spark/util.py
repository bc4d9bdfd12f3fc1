"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ntz_micros_sql(col: str = "ts") -> str:
    """SQL expression: epoch-microseconds of a TIMESTAMP_NTZ column,
    timezone-free.

    ``unix_micros(cast(ntz as timestamp))`` silently applies the Spark
    *session* timezone during the cast, so the same data would hash
    differently against the DuckDB oracle's naive ``epoch_us(ts)``
    whenever the session TZ isn't UTC. ``timestampdiff`` between two
    NTZ values never consults the session TZ.
    """
    return (
        "timestampdiff(MICROSECOND, "
        f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
    )

#: local_frame() falls back to createDataFrame above this row count —
#: a VALUES literal is a parser payload, not a data path
_LOCAL_FRAME_MAX_ROWS = 20_000


def _sql_literal(v) -> str | None:
    """Render one int/bool/str/None as a Spark SQL literal, or None if
    the value cannot round-trip exactly as a literal."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        if "\x00" in v:
            return None
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return None


def local_frame(spark, rows, schema: str) -> DataFrame:
    """A small driver-side frame as a LocalRelation, not a python RDD.

    ``spark.createDataFrame(list_of_tuples)`` parallelizes the pickled
    rows into an RDD-backed scan: EVERY action or broadcast over it
    schedules ``defaultParallelism`` python-worker tasks (measured at
    local[32]: 32 tasks, ~0.4-2.2 s per broadcast collect — for 32
    rows). Rendering the same rows as a SQL ``VALUES`` literal yields
    a LocalRelation the driver reads with zero tasks and zero python
    workers, which is also the right shape on a cluster: request
    lists, partition offsets and rule tables are plan metadata, not
    distributed data.

    Exact-round-trip types only (int/bool/str/None); any other value
    type, an empty list, or an oversized list falls back to
    ``createDataFrame`` unchanged. *schema* is a DDL string; every
    column is CAST to its declared type, so all-NULL columns type
    correctly.
    """
    if not rows or len(rows) > _LOCAL_FRAME_MAX_ROWS:
        return spark.createDataFrame(rows, schema=schema)
    lits: list[str] = []
    for row in rows:
        vals = []
        for v in row:
            lit = _sql_literal(v)
            if lit is None:
                return spark.createDataFrame(rows, schema=schema)
            vals.append(lit)
        lits.append("(" + ", ".join(vals) + ")")
    from pyspark.sql.types import StructType

    fields = StructType.fromDDL(schema)
    if any(len(r) != len(fields) for r in rows):
        return spark.createDataFrame(rows, schema=schema)
    proj = ", ".join(
        f"CAST(col{i + 1} AS {f.dataType.simpleString()}) AS `{f.name}`"
        for i, f in enumerate(fields)
    )
    return spark.sql(f"SELECT {proj} FROM VALUES " + ", ".join(lits))


#: frames pinned by operators whose plans re-reference an expensive
#: subtree (two-pass rank/cumsum, shingle self-joins). Callers run
#: :func:`release_cached` after materializing downstream results.
_CACHED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """Persist *df* and register it for :func:`release_cached`."""
    df = df.persist()
    _CACHED.append(df)
    return df


def release_cached() -> None:
    """Unpersist every frame pinned via :func:`pin`."""
    while _CACHED:
        _CACHED.pop().unpersist()


def session_frame(spark, key: tuple, build) -> DataFrame:
    """Session-scoped memo for a LAZY derived frame (r16, guide §1.2).

    The shared catalog derivations (`objects`/`members`/`requests`
    views over the fixture tables) cost 150-750 ms of driver-side
    py4j round-trips to CONSTRUCT (measured: `_members` 749 ms,
    `_objects` 423 ms per build at sf0.1 — thousands of JVM calls
    building the same Column trees), and most of the 180 declared
    queries rebuild them from scratch per invocation. Defining each
    view once per session is plain catalog behavior: the memoized
    object is an unexecuted plan — no data, no results — every action
    still scans the parquet inputs through the full derivation, and
    the memo dies with the session. Correctness is untouched because
    the memo returns the exact frame the builder would return.

    Key must include every input the derivation depends on (sf_dir at
    minimum); builders with on-disk side effects (io fixtures) stay
    correct because their effects are idempotent and marker-guarded.
    """
    memo = getattr(spark, "_aistore_frame_memo", None)
    if memo is None:
        memo = {}
        spark._aistore_frame_memo = memo
    df = memo.get(key)
    if df is None:
        df = build()
        memo[key] = df
    return df


def spread(df: DataFrame, min_factor: int = 2) -> DataFrame:
    """Round-robin repartition a frame whose scan under-parallelizes.

    The driver testdata is one parquet file with ONE row group per
    table, so Spark reads it as a single task no matter what
    ``maxPartitionBytes`` says; any CPU-heavy derivation downstream
    (shingling, tar building, UDFs) would run on one core. At real
    scale (many files / row groups) the scan splits naturally and this
    becomes a no-op — it only repartitions when the current partition
    count is below ``parallelism / min_factor``.

    KNOWN BLIND SPOT (r15 dd6b sf100 triage): the partition COUNT can
    overstate real parallelism. Spark slices a file into byte-range
    splits but row groups are the split atoms — a file with few/giant
    row groups reports many splits with all rows concentrated in a
    few (measured: 32 reported splits, 5 non-empty, 4-way-parallel
    fingerprint stage, 783 s wall). Paths whose per-byte compute
    dwarfs one linear exchange (simhash's 2-md5 + 64-CASE votes per
    word) should round-robin UNCONDITIONALLY instead of calling this.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * min_factor < target:
        return df.repartition(target)
    return df


def round_robin(df):
    """UNCONDITIONAL round-robin exchange to full default parallelism —
    the one audited spelling of the row-group blind-spot fix (r15
    verdict nit: the idiom lived twice, in ``simsearch._rebalance``
    and inline in ``dedup.simhash``). Use before a compute-heavy
    stage that inherits the scan's input splits: :func:`spread`'s
    partition-COUNT heuristic cannot see a few-giant-row-group file
    (32 reported byte-range splits, 5 non-empty), so paths whose
    per-byte compute dwarfs one linear exchange must not gate on it."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def md5_bucket(col, mod):
    """Deterministic bucket in ``[0, mod)`` from the first 8 hex digits
    of md5(col) — THE engine-portable bucketing primitive (hash_split,
    source_mixture, mountpath placement all share it; the DuckDB twin
    is ``('0x' || substr(md5(c), 1, 8))::BIGINT % mod``). One shared
    definition so the cross-engine determinism contract cannot drift
    per call site.
    """
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    m = mod if isinstance(mod, Column) else F.lit(mod)
    return (
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint") % m
    )


def ensure_shipped(spark) -> None:
    """Make the ``aistore_spark`` package importable on executor Python
    workers regardless of how the SparkSession was built.

    Our Pandas-UDF/mapInPandas closures pickle by module reference; a
    caller-provided session (the driver's harness) may spawn workers
    without this repo on PYTHONPATH. ``addPyFile`` of a package zip is
    runtime-safe and idempotent per SparkContext.
    """
    sc = spark.sparkContext
    if getattr(sc, "_aistore_spark_shipped", False):
        return
    import tempfile
    import zipfile
    from pathlib import Path

    pkg_root = Path(__file__).resolve().parent
    zpath = Path(tempfile.gettempdir()) / "aistore_spark_pkg.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for py in sorted(pkg_root.rglob("*.py")):
            z.write(py, arcname=str(py.relative_to(pkg_root.parent)))
    sc.addPyFile(str(zpath))
    sc._aistore_spark_shipped = True
