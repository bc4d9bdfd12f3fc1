"""Generate the sf100 scale tier — the THIRD decade of the scale
ladder (verdict-r13 item 4): a bench-only fixture for the scale-law
rows (ann9d, dd6b, dd1, d1, a1), sized to the catalog name-format
bounds that gen_sf10.py documents.

Derivation from /root/testdata/sf0.1, same contiguous-id remapping
discipline as tools/gen_sf10.py; per-table axes:

- ``documents``: 100 replicas x 10 sections = 10x sf10 rows (500,000)
  at sf10's per-doc byte size (~3 KB) — 1000x sf0.1 bytes total.
  doc_id tops out at 499,999, inside the objects-catalog ``lpad(_, 6)``
  bound (999,999). Each source doc now carries 100 near-dup replicas
  (vs 10 at sf10), so the near-dup family's candidate cliques DENSIFY
  with scale — deliberately: the hot-bucket sub-split (max_bucket) is
  the code path a 100 TB dedup run lives or dies by.
- ``embeddings``: 1000 replicas = 2,000,000 vectors (no name bounds).
- ``lineitem``: 1000 replicas, orderkey stride 150,000 (sf0.1 max
  key 149,999) -> max key 149,999,999, inside the member-name
  ``lpad(_, 9)`` bound (r15: the catalog contract widened from 8 to 9
  digits — verdict-r14 item 7 — precisely so this axis measures a
  TRUE 10x decade; under the old 8-digit bound the cap was 666x and
  d1's third-decade point was partial. lpad TRUNCATION past the bound
  aliases names and breaks every name-keyed plan, hence the assert).
- ``events`` is OMITTED: none of the five scale-law rows touches it,
  and 100x events would be ~1 GB of parquet spent on nothing this
  tier measures. The dims are copied verbatim (tiny).

Output: /root/repo/_scale/sf100/*.parquet (gitignored; ~8 GB).
Usage: python tools/gen_sf100.py [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
EMB_REPLICAS = 1000
DOC_REPLICAS = 100
DOC_SECTIONS = 10
LI_REPLICAS = 1000
LI_STRIDE = 150_000


def main() -> int:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/_scale/sf100")
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
        print(f"{t}: {n} rows", flush=True)

    n_docs = con.execute(
        f"SELECT count(*) FROM {src('documents')}"
    ).fetchone()[0]
    assert n_docs * DOC_REPLICAS <= 1_000_000, "objects lpad(6) bound"
    # identical section-marker format to gen_sf10 (' r<k> s<j> '), so a
    # replica group is the same near-dup shape, just 10x wider
    sections = " || ".join(
        f"d.text || ' r' || CAST(r.k AS VARCHAR) || ' s{j} '"
        for j in range(DOC_SECTIONS)
    )
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

    n_emb = con.execute(
        f"SELECT count(*) FROM {src('embeddings')}"
    ).fetchone()[0]
    write(
        "embeddings",
        f"""
        SELECT e.vec_id + r.k * {n_emb} AS vec_id, e.embedding
        FROM {src('embeddings')} e, range(0, {EMB_REPLICAS}) r(k)
        """,
    )

    max_ok = con.execute(
        f"SELECT max(l_orderkey) FROM {src('lineitem')}"
    ).fetchone()[0]
    assert max_ok < LI_STRIDE, "stride must exceed the source orderkey range"
    assert (LI_REPLICAS - 1) * LI_STRIDE + max_ok < 10**9, (
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
        FROM {src('lineitem')} l, range(0, {LI_REPLICAS}) r(k)
        """,
    )

    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        write(t, f"SELECT * FROM {src(t)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
