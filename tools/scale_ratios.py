"""Two-decade scale read (verdict-r9 #1): per-query wall ratios across
sf0.1 → sf1 → sf10 with the superlinear tell flagged.

For each query present in consecutive artifacts, the data grows 10x per
decade, so the wall ratio IS the scaling exponent proxy: ~1x = constant,
~3x = the measured healthy median (strongly sublinear vs data), ~10x =
linear, >10x = superlinear (output-driven or a plan defect — each must
be explained). A query whose sf1→sf10 ratio exceeds its sf0.1→sf1 ratio
is flagged: scaling got WORSE in the second decade, the signature of a
term that only dominates at scale.

Usage: python tools/scale_ratios.py SF01.json SF1.json SF10.json [top_n]
Artifacts may be bench.py full artifacts or driver tail-wrapped ones.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from bench_compare import load_artifact  # noqa: E402


def main() -> int:
    if len(sys.argv) < 4:
        print(
            "usage: python tools/scale_ratios.py SF01.json SF1.json "
            "SF10.json [top_n]"
        )
        return 2
    a01 = load_artifact(sys.argv[1])["queries"]
    a1 = load_artifact(sys.argv[2])["queries"]
    a10 = load_artifact(sys.argv[3])["queries"]
    top_n = int(sys.argv[4]) if len(sys.argv) > 4 else 15

    rows = []
    for name in sorted(set(a1) & set(a10)):
        t01, t1, t10 = a01.get(name), a1[name], a10[name]
        if t1 <= 0 or t10 <= 0:
            continue
        r2 = t10 / t1
        r1 = (t1 / t01) if t01 else None
        worse = r1 is not None and r2 > r1 * 1.25  # beyond-noise worsening
        rows.append((r2, name, t01, t1, t10, r1, worse))
    rows.sort(reverse=True)

    print("| query | sf0.1 | sf1 | sf10 | r(0.1→1) | r(1→10) | worse? |")
    print("|---|---|---|---|---|---|---|")
    for r2, name, t01, t1, t10, r1, worse in rows[:top_n]:
        print(
            f"| {name} | {t01 if t01 is not None else '—'} | {t1} | {t10} "
            f"| {f'{r1:.1f}x' if r1 else '—'} | {r2:.1f}x "
            f"| {'**YES**' if worse else ''} |"
        )
    flagged = [r for r in rows if r[6]]
    vals = sorted(r[0] for r in rows)
    med = vals[len(vals) // 2] if vals else float("nan")
    print(
        f"\n{len(rows)} shared queries; median sf1→sf10 ratio {med:.2f}x; "
        f"{len(flagged)} flagged worse-in-second-decade:"
    )
    for r2, name, _, t1, t10, r1, _ in flagged:
        print(f"  {name}: {r1:.1f}x -> {r2:.1f}x ({t1}s -> {t10}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
