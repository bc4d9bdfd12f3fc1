"""DuckDB-side mirrors of the catalog derivations in :mod:`catalog`.

Each constant is a SQL SELECT usable as a CTE body; :func:`with_catalogs`
prepends the requested ones to an oracle query. The SQL must stay in the
dialect subset DuckDB shares with ANSI (the driver runs these in DuckDB
with the raw parquet tables pre-registered as views).

These strings mirror ``aistore_spark/catalog.py`` expression for
expression — change both together (tests/test_catalog_parity.py enforces
it by comparing Spark and DuckDB outputs row-for-row).
"""

from __future__ import annotations

from aistore_spark.catalog import EKM_RULES

OBJECTS_SQL = """
SELECT
  'ais://' || source                                            AS bucket,
  lang || '/' || source || '/'
       || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.txt'       AS name,
  CAST(n_chars AS BIGINT)                                       AS size,
  md5(text)                                                     AS checksum,
  1735689600000000000 + doc_id * 60000000000                    AS atime_ns,
  CAST(1 + doc_id % 3 AS VARCHAR)                               AS version,
  CAST(1 + doc_id % 3 AS BIGINT)                                AS copies,
  substr(md5(text), 1, 1) <= 'a'                                AS cached,
  map(['ETag', 'source'], [md5(text), source])                  AS custom,
  doc_id,
  lang,
  source
FROM documents
"""

REMOTE_OBJECTS_SQL = """
SELECT
  'ais://' || source                                            AS bucket,
  lang || '/' || source || '/'
       || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.txt'       AS name,
  CAST(n_chars AS BIGINT)                                       AS size,
  CAST(1 + doc_id % 3
         + CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END
       AS VARCHAR)                                              AS version,
  doc_id
FROM documents
WHERE doc_id % 5 <> 0
"""

MEMBERS_SQL = """
SELECT
  'ais://shards'                                                AS bucket,
  'shard-' || lpad(CAST(l_orderkey % 128 AS VARCHAR), 5, '0')
           || '.tar'                                            AS shard,
  'rec-' || lpad(CAST(l_orderkey AS VARCHAR), 9, '0')           AS base,
  CASE l_linenumber % 3
    WHEN 0 THEN 'jpg' WHEN 1 THEN 'cls' ELSE 'xml' END          AS ext,
  'rec-' || lpad(CAST(l_orderkey AS VARCHAR), 9, '0') || '.'
         || CASE l_linenumber % 3
              WHEN 0 THEN 'jpg' WHEN 1 THEN 'cls' ELSE 'xml'
            END                                                 AS member,
  CAST(l_quantity AS BIGINT) * 1024 + l_linenumber              AS size,
  CAST(round(l_extendedprice * 100, 0) AS BIGINT)               AS key_int,
  l_extendedprice                                               AS key_float,
  l_returnflag || l_linestatus || '-' || 'rec-'
      || lpad(CAST(l_orderkey AS VARCHAR), 9, '0')              AS key_str,
  l_orderkey                                                    AS orderkey,
  CAST(l_linenumber AS BIGINT)                                  AS linenumber
FROM lineitem
"""

BATCH_REQUESTS_SQL = """
SELECT
  event_id                                                      AS req_idx,
  'ais://shards'                                                AS bucket,
  'rec-' || lpad(CAST((user_id * 131 + event_id * 7) % 20000
                      AS VARCHAR), 9, '0') || '.jpg'            AS objname
FROM events
"""

MIXED_REQUESTS_SQL = """
SELECT
  event_id                                                      AS req_idx,
  'ais://shards'                                                AS bucket,
  CASE WHEN (event_id % 3 = 1)
         OR (event_id % 3 = 2 AND user_id % 2 = 1)
       THEN 'shard-' || lpad(CAST((user_id * 131 + event_id * 7) % 20000 % 128
                                  AS VARCHAR), 5, '0') || '.tar'
       ELSE 'rec-' || lpad(CAST((user_id * 131 + event_id * 7) % 20000
                                AS VARCHAR), 9, '0') || '.jpg'
  END                                                           AS objname,
  CASE WHEN (event_id % 3 = 1)
         OR (event_id % 3 = 2 AND user_id % 2 = 1)
       THEN 'rec-' || lpad(CAST((user_id * 131 + event_id * 7) % 20000
                                AS VARCHAR), 9, '0')
            || CASE WHEN event_id % 3 = 1 THEN '.cls' ELSE '.xml' END
       ELSE ''
  END                                                           AS archpath,
  CAST(CASE WHEN event_id % 3 = 2 THEN (event_id * 17) % 40960
            ELSE 0 END AS BIGINT)                               AS rstart,
  CAST(CASE WHEN event_id % 3 = 2
            THEN CASE WHEN event_id % 5 = 0 THEN -1
                      ELSE (1 + event_id % 7) * 4096 END
            ELSE 0 END AS BIGINT)                               AS rlength
FROM events
"""

EKM_SQL = "SELECT * FROM (VALUES {rows}) AS t(pattern, template, priority)".format(
    rows=", ".join(f"('{p}', '{t}', {pr})" for p, t, pr in EKM_RULES)
)

FSHARE_FILES_SQL = """
SELECT lang || '/' || source || '/'
         || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.txt' AS rel_path,
       CAST(n_chars AS BIGINT)                              AS size
FROM documents
UNION ALL
SELECT lang || '/' || source || '/'
         || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.json' AS rel_path,
       CAST(n_chars // 10 + 2 AS BIGINT)                     AS size
FROM documents WHERE doc_id % 4 = 0
"""

_CATALOGS = {
    "objects": OBJECTS_SQL,
    "fshare_files": FSHARE_FILES_SQL,
    "remote_objects": REMOTE_OBJECTS_SQL,
    "members": MEMBERS_SQL,
    "batch_requests": BATCH_REQUESTS_SQL,
    "mixed_requests": MIXED_REQUESTS_SQL,
    "ekm": EKM_SQL,
}


def with_catalogs(query: str, *names: str) -> str:
    """Wrap *query* with CTEs for the named catalog derivations.

    A *query* that already starts with ``WITH`` has its own CTEs merged
    into the catalog CTE list.

    When ``AISTORE_ORACLE_MATERIALIZED`` is set in the environment (the
    sf1 strict gate: tools/check_oracle.py --materialize), the catalog
    CTEs are omitted — the harness pre-creates DuckDB temp tables with
    the same names from the same SQL, so every oracle reuses one
    materialization instead of re-deriving the catalog per query.
    """
    import os

    if os.environ.get("AISTORE_ORACLE_MATERIALIZED"):
        return query
    parts = [f"{n} AS ({_CATALOGS[n]})" for n in names]
    stripped = query.lstrip()
    if stripped.upper().startswith("WITH"):
        return "WITH " + ",\n".join(parts) + ",\n" + stripped[4:].lstrip()
    return "WITH " + ",\n".join(parts) + "\n" + query
