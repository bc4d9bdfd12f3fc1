"""Promote a bench partial flush into a BENCH-shaped artifact.

If a scale-tier sweep hits the round's wall-clock before bench.py's
final artifact write, the per-query partial flush
(SPARK_GRAFT_BENCH_PARTIAL) still holds every completed wall and every
recorded error. This tool wraps it in the bench artifact shape (total,
canary, sf) with an explicit ``partial: true`` marker so the ledger
never silently masquerades as a full sweep.

Usage: python tools/promote_partial_bench.py PARTIAL.json OUT.json SF
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

CANARY = [
    "s1_list_prefix_page",
    "a1_bucket_summary",
    "a7_rollup",
    "d7_topk_largest",
    "ev7_pivot",
]


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__.strip().splitlines()[-1])
        return 2
    d = json.loads(Path(sys.argv[1]).read_text())
    qs, errs = d.get("queries", {}), d.get("errors", {})
    canary = {n: qs[n] for n in CANARY if n in qs}
    vals = sorted(canary.values())
    out = {
        "metric": "total_declared_query_wall_sec_min_of_1",
        "value": round(sum(qs.values()), 3),
        "unit": "sec",
        "queries": qs,
        "errors": errs,
        "canary": canary,
        "canary_median_sec": vals[len(vals) // 2] if vals else None,
        "sf": float(sys.argv[3]),
        "partial": True,
        "n_queries": len(qs),
        "note": (
            "wall-clock cutoff: completed walls + recorded errors from "
            "the per-query partial flush; queries absent from both maps "
            "were never attempted"
        ),
    }
    Path(sys.argv[2]).write_text(json.dumps(out, indent=2) + "\n")
    print(f"promoted {len(qs)} walls + {len(errs)} errors -> {sys.argv[2]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
