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
    args = ap.parse_args()

    base = args.base
    if base is None:
        prior = sorted(
            REPO.glob("CORRECTNESS_SF10_r*.json"),
            key=lambda p: int(re.search(r"_r(\d+)", p.name).group(1)),
        )
        prior = [
            p for p in prior
            if re.fullmatch(r"CORRECTNESS_SF10_r\d+\.json", p.name)
            and int(re.search(r"_r(\d+)", p.name).group(1)) < args.round
        ]
        if not prior:
            print("no prior merged ledger found; starting empty")
        else:
            base = prior[-1]
    sources: list[Path] = [Path(base)] if base else []
    sources += sorted(
        REPO.glob(f"CORRECTNESS_SF10_r{args.round}_new*.json"),
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
    target = REPO / f"CORRECTNESS_SF10_r{args.round}.json"
    target.write_text(json.dumps(out, indent=2) + "\n")

    buckets: dict[str, list[str]] = {
        "green": [], "skip": [], "rows_only": [], "failure": []
    }
    for n, r in out.items():
        buckets[classify(r)].append(n)
    missing = [n for n in registered if n not in out]
    print(f"registered: {len(registered)}  rows: {len(out)}  -> {target.name}")
    print(
        f"hash-exact: {len(buckets['green'])}  reasoned skips: "
        f"{len(buckets['skip'])}  rows-only: {len(buckets['rows_only'])}  "
        f"failures: {len(buckets['failure'])}  not attempted: {len(missing)}"
    )
    for n in sorted(buckets["skip"]):
        print(f"  skip {n}: {str(out[n]['err'])[:110]}")
    if buckets["failure"]:
        print(f"  FAILURES: {sorted(buckets['failure'])}")
    if missing:
        print(f"  MISSING: {missing}")
    return 1 if buckets["failure"] or missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
