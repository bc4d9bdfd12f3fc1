"""Canary-normalized cross-round bench comparison (verdict-r8 #7).

Host drift of ±15-50% on byte-identical code (documented NOTES_r07,
reproduced by the judge in r8) makes raw cross-round per-query reads
near-useless. bench.py now times a 5-query pure-JVM canary set whose
plans are byte-stable; this tool reads two bench artifacts, computes
the host-speed factor as the ratio of canary medians, and reports each
query's drift NORMALIZED by that factor — residual deltas beyond the
canary band are the real signal.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold]
Prints queries whose normalized ratio exceeds the threshold (default
1.3 either way), plus the canary factor itself.
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


def canary_median(art: dict) -> float | None:
    if art.get("canary_median_sec"):
        return art["canary_median_sec"]
    qs = art.get("queries", {})
    vals = sorted(qs[n] for n in CANARY if n in qs)
    return vals[len(vals) // 2] if vals else None


def main() -> int:
    old = json.loads(Path(sys.argv[1]).read_text())
    new = json.loads(Path(sys.argv[2]).read_text())
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    co, cn = canary_median(old), canary_median(new)
    if not co or not cn:
        print("no canary data in one of the artifacts; raw ratios only")
        host = 1.0
    else:
        host = cn / co
        print(
            f"canary medians: old={co:.3f}s new={cn:.3f}s "
            f"host factor={host:.2f}x (new/old)"
        )
    qo, qn = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(qo) & set(qn))
    print(f"{len(shared)} shared queries; flagging normalized ratio "
          f"outside [{1 / thresh:.2f}, {thresh:.2f}]:")
    flagged = 0
    for name in shared:
        if qo[name] <= 0:
            continue
        norm = (qn[name] / qo[name]) / host
        if norm > thresh or norm < 1 / thresh:
            flagged += 1
            print(
                f"  {name}: {qo[name]:.2f}s -> {qn[name]:.2f}s "
                f"(normalized {norm:.2f}x)"
            )
    if not flagged:
        print("  none — all drift within the canary band")
    t_old = sum(qo[n] for n in shared)
    t_new = sum(qn[n] for n in shared)
    print(
        f"shared-total: {t_old:.1f}s -> {t_new:.1f}s raw "
        f"({t_new / t_old:.2f}x), normalized {(t_new / t_old) / host:.2f}x"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
