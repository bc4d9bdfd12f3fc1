"""Independent large-SF twin for dd7_dup_groups / pipe3_dedup_report.

Their registered DuckDB oracle computes connected components with a
recursive `reach` CTE, which materializes O(Σ component²) rows — at sf1
(replicated near-dup corpus, components of hundreds of docs) that
exceeded 66 GB and was recorded as a reasoned skip in the r6/r7 sf1
ledgers. This twin closes those two skips WITHOUT weakening
independence:

- The edge derivation (LSH candidates → exact Jaccard verify) stays in
  DuckDB, reusing the exact registered ``_DUP_PAIRS_CTES`` prefix —
  the same shape as dd2's oracle, which the sf1 gate already proved
  feasible at scale.
- ONLY the transitive closure is replaced: a dict-based iterative BFS
  in pure Python (no numpy) assigns each node the min doc_id of its
  component. Spark's fast path is an array union-find with path
  compression and its distributed path is min-label propagation — a
  third, independent algorithm/implementation.
- The per-group aggregation (n_docs, docs_md5, n_pairs) is rebuilt in
  pandas + hashlib, mirroring the oracle's
  ``md5(string_agg(lpad(doc_id, 8, '0'), ',' ORDER BY doc_id))``.
- Comparison uses the gate's own canonicalizer/equality
  (tools/check_oracle.frames_equal), including dtype equality and the
  non-scalar-cell guard, so "twin-green" is exactly as strict as
  "gate-green".

The twin itself is validated at small SF by tests/test_cc_twin.py:
three-way agreement (recursive SQL oracle == Python BFS twin == Spark)
at sf0.001 and sf0.01, where the recursive closure is still cheap.

Usage: python tools/cc_twin.py [--json LEDGER.json] [sf_dir]

With --json, updates the dd7_dup_groups / pipe3_dedup_report rows of an
existing ledger in place, recording the twin method in a ``method``
field (never silently upgrading a skip: the previous ``err`` text is
preserved under ``prior_skip``).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from check_oracle import frames_equal  # gate-strict compare

METHOD = (
    "duckdb pairs CTEs (dd2-oracle shape) + independent Python BFS "
    "closure + pandas/hashlib aggregation; recursive-SQL closure "
    "infeasible at this SF"
)


def python_cc(pairs: pd.DataFrame) -> dict[int, int]:
    """Min-label connected components via iterative BFS over a dict
    adjacency — deliberately NOT union-find (Spark's fast path) nor
    label propagation (Spark's distributed path)."""
    adj: dict[int, list[int]] = {}
    for a, b in zip(pairs["doc_a"].tolist(), pairs["doc_b"].tolist()):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    label: dict[int, int] = {}
    for start in adj:
        if start in label:
            continue
        comp = [start]
        seen = {start}
        stack = [start]
        while stack:
            node = stack.pop()
            for nxt in adj[node]:
                if nxt not in seen:
                    seen.add(nxt)
                    comp.append(nxt)
                    stack.append(nxt)
        root = min(comp)
        for node in comp:
            label[node] = root
    return label


def expected_frames(
    pairs: pd.DataFrame,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Build the dd7 and pipe3 expected results from the pairs frame."""
    label = python_cc(pairs)
    groups: dict[int, list[int]] = {}
    for doc, g in label.items():
        groups.setdefault(g, []).append(doc)
    rows = []
    for g, docs in groups.items():
        docs.sort()
        joined = ",".join(str(d).zfill(8) for d in docs)
        rows.append(
            (g, len(docs), hashlib.md5(joined.encode()).hexdigest())
        )
    dd7 = pd.DataFrame(rows, columns=["group_id", "n_docs", "docs_md5"])
    dd7["group_id"] = dd7["group_id"].astype("int64")
    dd7["n_docs"] = dd7["n_docs"].astype("int64")

    # pipe3 adds per-group pair counts (pairs keyed by doc_a's group)
    pair_grp = pairs["doc_a"].map(label)
    n_pairs = pair_grp.value_counts()
    pipe3 = dd7.copy()
    pipe3["n_pairs"] = (
        pipe3["group_id"].map(n_pairs).fillna(0).astype("int64")
    )
    # the registered oracle INNER-joins gpairs, dropping groups whose
    # pairs all key to another member — mirror that exactly
    pipe3 = pipe3[pipe3["group_id"].isin(n_pairs.index)].reset_index(
        drop=True
    )
    return dd7, pipe3


def run(sf_dir: str, json_out: str | None) -> int:
    from aistore_spark.benchqueries import _DUP_PAIRS_CTES
    from aistore_spark.session import get_spark
    from aistore_spark.util import release_cached
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    # Budget the DuckDB leg exactly like tools/check_oracle.py does
    # (verdict-r14 item 4): the bare connection self-sizes at ~80% of
    # host RAM, ignores the Spark JVM, and keeps insertion order — at
    # sf10 that combination spilled >60 GB of external-sort temp and
    # exhausted the disk (the r13/r14 dd7 skip), while dd2's oracle —
    # the SAME pairs-prefix shape — ran green under check_oracle's
    # pinned budget. Env knobs mirror the check_oracle names.
    mem = os.environ.get("DUCKDB_MEM", "40GB")
    spill = Path("/tmp/duckdb_spill")
    spill.mkdir(exist_ok=True)
    con.sql(f"SET memory_limit='{mem}'")
    con.sql(f"SET temp_directory='{spill}'")
    con.sql(
        "SET max_temp_directory_size="
        f"'{os.environ.get('CHECK_ORACLE_SPILL_CAP', '50GB')}'"
    )
    con.sql("SET preserve_insertion_order=false")
    con.sql(f"SET threads TO {os.environ.get('CHECK_ORACLE_CPUS', '24')}")
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    t0 = time.time()
    pairs = con.sql(
        _DUP_PAIRS_CTES + "SELECT doc_a, doc_b FROM pairs"
    ).df()
    con.close()  # release spill temp before the Spark leg starts
    print(f"duckdb pairs: {len(pairs)} rows ({time.time() - t0:.1f}s)")
    t0 = time.time()
    exp_dd7, exp_pipe3 = expected_frames(pairs)
    print(
        f"python BFS: {len(exp_dd7)} groups ({time.time() - t0:.1f}s)"
    )

    spark = get_spark("cc_twin", cpus=8)
    qs = entrymod.queries()
    ledger = json.loads(Path(json_out).read_text()) if json_out else {}
    failed = []
    for name, expected in (
        ("dd7_dup_groups", exp_dd7),
        ("pipe3_dedup_report", exp_pipe3),
    ):
        t0 = time.time()
        sdf = qs[name](spark, sf_dir).toPandas()
        release_cached()
        rec = {
            "rows_match": len(sdf) == len(expected),
            "schema_match": sorted(sdf.columns)
            == sorted(expected.columns),
            "hash_match": False,
            "spark_rows": len(sdf),
            "oracle_rows": len(expected),
            "err": None,
            "method": METHOD,
        }
        dt_bad = [
            (c, str(sdf[c].dtype), str(expected[c].dtype))
            for c in sorted(sdf.columns)
            if c in expected.columns
            and str(sdf[c].dtype) != str(expected[c].dtype)
        ]
        if dt_bad:
            rec["err"] = f"dtype: {dt_bad}"[:300]
        elif not rec["schema_match"]:
            rec["err"] = (
                f"columns {sorted(sdf.columns)} vs "
                f"{sorted(expected.columns)}"
            )[:300]
        elif not rec["rows_match"]:
            rec["err"] = f"rows {len(sdf)} vs {len(expected)}"
        elif not frames_equal(sdf, expected):
            rec["err"] = "value mismatch"
        else:
            rec["hash_match"] = True
        status = "ok  " if rec["hash_match"] else "FAIL"
        print(
            f"{status}  {name}: {len(sdf)} rows vs {len(expected)} "
            f"({time.time() - t0:.1f}s)"
            + ("" if rec["hash_match"] else f"  err={rec['err']}")
        )
        if not rec["hash_match"]:
            failed.append(name)
        if json_out and name in ledger:
            prior = ledger[name].get("err")
            if prior and prior.startswith("skipped"):
                rec["prior_skip"] = prior
            ledger[name] = rec
    if json_out:
        Path(json_out).write_text(json.dumps(ledger, indent=2) + "\n")
        print(f"updated {json_out}")
    return 1 if failed else 0


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    return run(sf_dir, json_out)


if __name__ == "__main__":
    raise SystemExit(main())
