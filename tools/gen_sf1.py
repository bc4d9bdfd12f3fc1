"""Generate an sf1 scale tier (10x sf0.1) for the scale gate
(verdict-r5 item 4).

The driver ships sf0.001/0.01/0.1 only; this derives sf1 by 10x
replication of sf0.1 with CONTIGUOUS id remapping (replica k offsets
doc_id/event_id/vec_id by k*N, so every id range stays 0..10N-1 and
the doc_id-modulus strata keep their exact proportions) and a
per-replica text suffix (' r<k>') so the duplicate structure scales
naturally instead of manufacturing a 10-way exact-dup clique per
document (which would inflate every dedup family quadratically and
measure an artifact, not scaling). n_chars tracks the new length;
lineitem orderkeys shift by k*2^20 to keep member keys unique; the
small TPC-H dims copy through unchanged.

Output: /root/repo/_scale/sf1/*.parquet (gitignored; ~10x sf0.1).
Usage: python tools/gen_sf1.py [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def main() -> int:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/_scale/sf1")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        # bounded row groups for the wide-row tables: a single default
        # 122880-row group makes Spark's scan one-task no matter what
        # maxPartitionBytes says (row groups are the split atoms), and
        # every CPU-heavy scan-stage derivation serializes (the r15
        # dd6b sf100 triage: 4 row groups -> 4 busy tasks of 32,
        # 783 s wall). 2048-row documents groups ~= 6-60 MB each.
        rg = {"documents": 2048, "embeddings": 16384}.get(t)
        opt = f", ROW_GROUP_SIZE {rg}" if rg else ""
        con.execute(
            f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET{opt})"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")

    rep = f"range(0, {REPLICAS}) r(k)"

    n_docs = con.execute(f"SELECT count(*) FROM {src('documents')}").fetchone()[0]
    write(
        "documents",
        f"""
        SELECT d.doc_id + r.k * {n_docs} AS doc_id,
               d.text || ' r' || CAST(r.k AS VARCHAR) AS text,
               d.lang, d.source,
               d.n_chars + 2 + length(CAST(r.k AS VARCHAR)) AS n_chars
        FROM {src('documents')} d, {rep}
        """,
    )

    n_emb = con.execute(f"SELECT count(*) FROM {src('embeddings')}").fetchone()[0]
    write(
        "embeddings",
        f"""
        SELECT e.vec_id + r.k * {n_emb} AS vec_id, e.embedding
        FROM {src('embeddings')} e, {rep}
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
        FROM {src('events')} e, {rep}
        """,
    )

    li_cols = [
        r[0]
        for r in con.execute(f"DESCRIBE SELECT * FROM {src('lineitem')}").fetchall()
    ]
    rest = ", ".join(f"l.{c}" for c in li_cols if c != "l_orderkey")
    write(
        "lineitem",
        f"""
        SELECT l.l_orderkey + r.k * (1 << 20) AS l_orderkey, {rest}
        FROM {src('lineitem')} l, {rep}
        """,
    )

    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        write(t, f"SELECT * FROM {src(t)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
