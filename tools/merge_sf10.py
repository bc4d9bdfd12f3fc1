"""Merge sf10 strict-correctness ledger partials into one canonical
per-round artifact (verdict-r12 item 7 — generalizes the one-off
``merge_sf10_r11.py``).

Usage: python tools/merge_sf10.py --round N [--base LEDGER.json]

Sources, later-wins on conflicts:
  1. ``--base`` (default: the newest ``CORRECTNESS_SF10_r{M}.json``
     with M < N) — the previous round's merged ledger
  2. ``CORRECTNESS_SF10_r{N}_new*.json`` partials, sorted by the
     numeric suffix (``_new`` < ``_new2`` < ... < ``_new10``)

Writes ``CORRECTNESS_SF10_r{N}.json`` and prints the coverage summary.

Failure classification is strict (verdict-r12 "what's wrong" #2): a
row is GREEN only if ``hash_match`` is true; a SKIP only if ``err``
starts with "skipped"; ROWS-ONLY only if ``err`` starts with "no
oracle". Anything else — including a row with a null ``err`` but a
false flag — counts as a FAILURE and the merge exits nonzero.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def partial_key(p: Path) -> int:
    m = re.search(r"_new(\d*)\.json$", p.name)
    return int(m.group(1) or 1)


#: skip taxonomy (verdict-r12 item 6): permanently-structural skips are
#: counted separately from convertible ones. "structural" = the row's
#: registered config makes a single-node oracle infeasible BY DESIGN
#: and a sized/bounded twin is the measured scale row; "measured-
#: infeasible" = a concrete resource wall was measured and documented
#: (NOTES_r11 taxonomy). Any other skip is "convertible" — raise the
#: oracle cap / pin DuckDB memory and retry next sweep.
SKIP_KINDS = {
    # by-design-exhaustive baselines; bounded twins dd5b/dd12b and the
    # LSH/SemDeDup rows are their scale paths
    "ann1_brute_topk": "structural",
    "dd5_embedding_neardup": "structural",
    "dd12_minhash_estimate": "structural",
    # fixed 16-cell quality-tier CONTRAST rows: probe 25-75% of the
    # corpus per query by config (hash-exact at sf0.01/sf1); the
    # engine's own sizing rule replaces them at scale — ann9d
    # (sqrt-N cells, nprobe 20 of 447 at sf10) is the sized row,
    # sf10 hash-exact as of round 13
    "ann9b_ivfpq_refined": "structural",
    "ann9c_ivfpq_refined_clustered": "structural",
    # dd7/pipe3 LEFT this class in r15: the >60 GB spill traced to
    # tools/cc_twin.py's unbudgeted DuckDB connection (self-sized vs
    # the Spark JVM, insertion order preserved); under check_oracle's
    # pin/spill config the same pairs prefix ran in 37.9 s and both
    # rows went hash-exact via the Python-BFS twin.
    # dd9: FINAL after a THIRD measured budget (r15) — the oracle was
    # restructured to list_dot_product (no 64-way unnest, the ann5b
    # technique) and still spilled 63.3 GiB at an 80 GB pin; the
    # within-cell pair join's intermediate is the wall, not the dot
    # arithmetic (40GB r11 / 80GB r13 / restructured 80GB r15).
    "dd9_semantic_dedup": "measured-infeasible",
    # ann9e: THREE measured budgets (r16) — 40 GB pin, 80 GB pin, and
    # 80 GB pin with the adc stage restructured to a single-evaluation
    # LUT-list projection (hash-exact at sf0.01/sf1 in that form); all
    # exhausted the 55.8 GiB disk-capped temp. The probed mass is the
    # tier's design: 4.5% of cells = 22.5% of brute mass on the
    # mode-saturated fixture (89,967,115 pairs at sf10, measured).
    "ann9e_ivfpq_recall_held": "measured-infeasible",
}


def classify(rec: dict) -> str:
    err = str(rec.get("err") or "")
    if rec.get("hash_match") is True:
        return "green"
    if err.startswith("skipped"):
        return "skip"
    if err.startswith("no oracle"):
        return "rows_only"
    return "failure"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--base", default=None,
                    help="previous merged ledger (default: newest r<N)")
    ap.add_argument("--prefix", default="CORRECTNESS_SF10",
                    help="ledger family (e.g. CORRECTNESS_SF1)")
    args = ap.parse_args()
    prefix = args.prefix

    base = args.base
    if base is None:
        prior = sorted(
            REPO.glob(f"{prefix}_r*.json"),
            key=lambda p: int(re.search(r"_r(\d+)", p.name).group(1)),
        )
        prior = [
            p for p in prior
            if re.fullmatch(re.escape(prefix) + r"_r\d+\.json", p.name)
            and int(re.search(r"_r(\d+)", p.name).group(1)) < args.round
        ]
        if not prior:
            print("no prior merged ledger found; starting empty")
        else:
            base = prior[-1]
    sources: list[Path] = [Path(base)] if base else []
    sources += sorted(
        REPO.glob(f"{prefix}_r{args.round}_new*.json"),
        key=partial_key,
    )

    merged: dict[str, dict] = {}
    for p in sources:
        if not p.exists():
            print(f"missing source {p.name} (skipped)")
            continue
        rows = json.loads(p.read_text())
        for name, rec in rows.items():
            rec = dict(rec)
            rec["source"] = p.name
            merged[name] = rec

    import __spark_entry__ as entry

    registered = list(entry.queries())
    out = {n: merged[n] for n in sorted(merged)}
    buckets: dict[str, list[str]] = {
        "green": [], "skip": [], "rows_only": [], "failure": []
    }
    kinds: dict[str, str] = {}
    for n, r in out.items():
        c = classify(r)
        buckets[c].append(n)
        if c == "skip":
            kinds[n] = SKIP_KINDS.get(n, "convertible")
            r["skip_kind"] = kinds[n]
    target = REPO / f"{prefix}_r{args.round}.json"
    target.write_text(json.dumps(out, indent=2) + "\n")

    missing = [n for n in registered if n not in out]
    n_struct = sum(1 for k in kinds.values() if k == "structural")
    n_meas = sum(1 for k in kinds.values() if k == "measured-infeasible")
    n_conv = sum(1 for k in kinds.values() if k == "convertible")
    print(f"registered: {len(registered)}  rows: {len(out)}  -> {target.name}")
    print(
        f"hash-exact: {len(buckets['green'])}  reasoned skips: "
        f"{len(buckets['skip'])} ({n_struct} structural, {n_meas} "
        f"measured-infeasible, {n_conv} convertible)  rows-only: "
        f"{len(buckets['rows_only'])}  failures: {len(buckets['failure'])}  "
        f"not attempted: {len(missing)}"
    )
    for n in sorted(buckets["skip"]):
        print(f"  skip[{kinds[n]}] {n}: {str(out[n]['err'])[:100]}")
    if buckets["failure"]:
        print(f"  FAILURES: {sorted(buckets['failure'])}")
    if missing:
        print(f"  MISSING: {missing}")
    return 1 if buckets["failure"] or missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
