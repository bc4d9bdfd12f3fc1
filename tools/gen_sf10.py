"""Generate the sf10 scale tier (100x sf0.1 bytes) for the second
decade of the scale gate (verdict-r8 #3).

Derivation from /root/testdata/sf0.1, same contiguous-id remapping
discipline as tools/gen_sf1.py — but the axes differ per table because
the catalog derivations impose name-format bounds:

- ``documents``: 10x ROWS x 10x BYTES (not 100x rows). The objects
  catalog derives names with ``lpad(doc_id, 6)``; 100x replication
  would push doc_id past 999,999 and the (identical in Spark and
  DuckDB) lpad TRUNCATION would alias distinct docs onto duplicate
  names — every name-keyed join (J3 diff, M-family anti-joins) would
  then fan out quadratically inside duplicate groups and the measured
  "superlinear tell" would be a fixture artifact, not a plan property.
  Instead each of 10 replicas carries 10x-longer text (the text
  repeated with distinct replica/section markers), so the text/dedup/
  BPE family scales by bytes (shingle count is linear in bytes) while
  names stay unique.
- ``lineitem``: 100x rows; orderkey stride 1,000,000 (not sf1's 2^20)
  keeps the max key at 99.6M — well inside the member-name ``lpad(.., 9)``
  bound the same truncation hazard would break at k>=95.
- ``events`` / ``embeddings``: 100x rows, id strides as in gen_sf1.

Output: /root/repo/_scale/sf10/*.parquet (gitignored; ~1.4 GB).
Usage: python tools/gen_sf10.py [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 100
DOC_REPLICAS = 10
DOC_SECTIONS = 10
LI_STRIDE = 1_000_000


def main() -> int:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/_scale/sf10")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        # bounded row groups (see gen_sf1.py note; r15 dd6b triage):
        # row groups are Spark's split atoms — the default single-CTAS
        # 122880-row groups serialize every scan-stage derivation
        rg = {"documents": 2048, "embeddings": 16384}.get(t)
        opt = f", ROW_GROUP_SIZE {rg}" if rg else ""
        con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET{opt})")
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows")

    n_docs = con.execute(
        f"SELECT count(*) FROM {src('documents')}"
    ).fetchone()[0]
    # 10 replicas x 10 sections: text = the source text repeated with a
    # ' r<k> s<j>' marker per section, so bytes scale 10x per doc while
    # the near-dup structure scales naturally (replicas of a doc stay
    # near-dups of each other, never exact dups)
    sections = " || ".join(
        f"d.text || ' r' || CAST(r.k AS VARCHAR) || ' s{j} '"
        for j in range(DOC_SECTIONS)
    )
    # n_chars must equal length(text) exactly (size oracles key on it):
    # compute it FROM the text, never from marker-width arithmetic (the
    # r9 formula was off by one char per section and only the verify
    # branch below saved the output)
    write(
        "documents",
        f"""
        SELECT doc_id, text, lang, source, length(text) AS n_chars
        FROM (
          SELECT d.doc_id + r.k * {n_docs} AS doc_id,
                 {sections} AS text,
                 d.lang, d.source
          FROM {src('documents')} d, range(0, {DOC_REPLICAS}) r(k)
        )
        """,
    )
    # belt-and-braces verify (should never fire now):
    bad = con.execute(
        f"SELECT count(*) FROM '{out}/documents.parquet' "
        "WHERE n_chars <> length(text)"
    ).fetchone()[0]
    if bad:
        # recompute from the text itself — exactness beats arithmetic
        con.execute(
            f"""
            COPY (SELECT doc_id, text, lang, source,
                         length(text) AS n_chars
                  FROM '{out}/documents.parquet')
            TO '{out}/documents2.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 2048)
            """
        )
        Path(out, "documents2.parquet").replace(Path(out, "documents.parquet"))
        print(f"documents: n_chars recomputed from text ({bad} rows off)")

    n_emb = con.execute(
        f"SELECT count(*) FROM {src('embeddings')}"
    ).fetchone()[0]
    write(
        "embeddings",
        f"""
        SELECT e.vec_id + r.k * {n_emb} AS vec_id, e.embedding
        FROM {src('embeddings')} e, range(0, {REPLICAS}) r(k)
        """,
    )

    n_ev = con.execute(f"SELECT count(*) FROM {src('events')}").fetchone()[0]
    n_users = con.execute(
        f"SELECT max(user_id) + 1 FROM {src('events')}"
    ).fetchone()[0]
    write(
        "events",
        f"""
        SELECT e.event_id + r.k * {n_ev} AS event_id, e.ts,
               e.user_id + r.k * {n_users} AS user_id,
               e.event_type, e.value, e.props
        FROM {src('events')} e, range(0, {REPLICAS}) r(k)
        """,
    )

    max_ok = con.execute(
        f"SELECT max(l_orderkey) FROM {src('lineitem')}"
    ).fetchone()[0]
    assert max_ok < LI_STRIDE, "stride must exceed the source orderkey range"
    assert (REPLICAS - 1) * LI_STRIDE + max_ok < 10**9, (
        "member names lpad(orderkey, 9) — keys must stay 9-digit"
    )
    li_cols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM {src('lineitem')}"
        ).fetchall()
    ]
    rest = ", ".join(f"l.{c}" for c in li_cols if c != "l_orderkey")
    write(
        "lineitem",
        f"""
        SELECT l.l_orderkey + r.k * {LI_STRIDE} AS l_orderkey, {rest}
        FROM {src('lineitem')} l, range(0, {REPLICAS}) r(k)
        """,
    )

    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        write(t, f"SELECT * FROM {src(t)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
