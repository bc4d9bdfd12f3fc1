"""Merge the sf10 strict-correctness ledgers into the round-11
artifact covering the FULL registry (verdict-r10 #1).

Sources, later-wins on conflicts:
  1. CORRECTNESS_SF10_r10.json      — the 65 rows round 10 attempted
  2. CORRECTNESS_SF10_r11_new.json  — the first r11 batch (11 rows,
     the sweep that was terminated mid-run; all green)
  3. CORRECTNESS_SF10_r11_new2.json — the remainder + reasoned skips
  4. CORRECTNESS_SF10_r11_new3.json — ann9d (sqrt(N) cells) and the
     real-HTTP downloader rows, registered after the main sweep began

Writes CORRECTNESS_SF10_r11.json and prints the coverage summary the
done-criterion names (total rows, hash-exact count, skip reasons).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SOURCES = [
    "CORRECTNESS_SF10_r10.json",
    "CORRECTNESS_SF10_r11_new.json",
    "CORRECTNESS_SF10_r11_new2.json",
    "CORRECTNESS_SF10_r11_new3.json",  # ann9d + the real-HTTP rows
    "CORRECTNESS_SF10_r11_new4.json",  # heavy rows through g3 (first pass)
    "CORRECTNESS_SF10_r11_new5.json",  # heavy tail after the ivf_topk fix
    "CORRECTNESS_SF10_r11_new6.json",  # tx10 + g1c (--duckdb-mem 48GB leg)
    "CORRECTNESS_SF10_r11_new7.json",  # g2/pipe3/ann8 retries + dd7 skip
    "CORRECTNESS_SF10_r11_new8.json",  # pipe3/ann8 measured-infeasible skips
    "CORRECTNESS_SF10_r11_new9.json",  # dd6/dd10 skip->green at 700s oracle cap
    "CORRECTNESS_SF10_r11_new10.json",  # pipe4 green; ann3b holds past 600s too
]


def main() -> int:
    merged: dict[str, dict] = {}
    for src in SOURCES:
        p = REPO / src
        if not p.exists():
            print(f"missing source {src} (skipped)")
            continue
        rows = json.loads(p.read_text())
        for name, rec in rows.items():
            rec = dict(rec)
            rec["source"] = src
            merged[name] = rec
    import __spark_entry__ as entry

    registered = list(entry.queries())
    out = {n: merged[n] for n in sorted(merged)}
    (REPO / "CORRECTNESS_SF10_r11.json").write_text(
        json.dumps(out, indent=2) + "\n"
    )
    green = [n for n, r in out.items() if r.get("hash_match")]
    skips = {
        n: r["err"]
        for n, r in out.items()
        if r.get("err") and str(r["err"]).startswith("skipped")
    }
    fails = [
        n
        for n, r in out.items()
        if r.get("err") and not str(r["err"]).startswith(("skipped", "no oracle"))
    ]
    missing = [n for n in registered if n not in out]
    print(f"registered: {len(registered)}  rows: {len(out)}")
    print(f"hash-exact: {len(green)}  reasoned skips: {len(skips)}  "
          f"failures: {len(fails)}  not attempted: {len(missing)}")
    for n, why in sorted(skips.items()):
        print(f"  skip {n}: {why[:110]}")
    if fails:
        print(f"  FAILURES: {fails}")
    if missing:
        print(f"  MISSING: {missing}")
    return 1 if fails or missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
