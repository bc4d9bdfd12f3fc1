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

Host factor (verdict-r10 "what's wrong" #1): the original five
sub-second canaries are dominated by fixed per-job overhead, so their
median cannot normalize CPU-bound multi-second queries — when both
artifacts carry the CPU-BOUND fixed-size canary median
(cpu_canary_median_sec, bench.py cpu_canaries: md5 over 100 MB, 1M-row
sort, 2M-row agg) THAT ratio is the host factor; the sub-second median
is still reported, as overhead drift only.

Accepts BOTH artifact shapes: bench.py's own full artifact
(BENCH_FULL*.json) and the driver's wrapper ({n, rc, tail, parsed})
where ``tail`` holds the stdout JSON line, possibly truncated at the
driver's 2000-char capture — per-query times are then recovered by
regex from whatever survived the cut.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

CANARY = [
    "s1_list_prefix_page",
    "a1_bucket_summary",
    "a7_rollup",
    "d7_topk_largest",
    "ev7_pivot",
]

#: max/median task-duration ratio above which a stage counts as a
#: straggler (verdict-r12 item 4)
SKEW_THRESHOLD = 8.0


def load_artifact(path: str) -> dict:
    """Normalize either artifact shape to {queries, canary_median_sec}."""
    art = json.loads(Path(path).read_text())
    if "queries" in art:
        return art
    # driver wrapper: prefer the parsed dict if the line fit the
    # capture; otherwise salvage "name": secs pairs from the tail text
    parsed = art.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return parsed
    tail = art.get("tail", "") or ""
    start = tail.find('{"metric"')
    blob = tail[start:] if start >= 0 else tail
    queries = {}
    m = re.search(r'"queries"\s*:\s*\{', blob)
    if m:
        # the queries object is flat: stop at its closing brace so the
        # "derived"/"canary" sections never masquerade as query walls
        # (a truncated tail has no closing brace — take what survived)
        end = blob.find("}", m.end())
        section = blob[m.end(): end if end >= 0 else len(blob)]
        for name, sec in re.findall(
            r'"([A-Za-z0-9_]+)"\s*:\s*([0-9.]+)', section
        ):
            queries.setdefault(name, float(sec))
    cm = re.search(r'"canary_median_sec"\s*:\s*([0-9.]+)', blob)
    pm = re.search(r'"cpu_canary_median_sec"\s*:\s*([0-9.]+)', blob)
    return {
        "queries": queries,
        "canary_median_sec": float(cm.group(1)) if cm else None,
        "cpu_canary_median_sec": float(pm.group(1)) if pm else None,
    }


def canary_median(art: dict) -> float | None:
    if art.get("canary_median_sec"):
        return art["canary_median_sec"]
    qs = art.get("queries", {})
    vals = sorted(qs[n] for n in CANARY if n in qs)
    return vals[len(vals) // 2] if vals else None


def cpu_canary_median(art: dict) -> float | None:
    if art.get("cpu_canary_median_sec"):
        return art["cpu_canary_median_sec"]
    vals = sorted((art.get("cpu_canary") or {}).values())
    return vals[len(vals) // 2] if vals else None


def main() -> int:
    if len(sys.argv) < 3:
        print("usage: python tools/bench_compare.py OLD.json NEW.json "
              "[threshold]")
        return 2
    old = load_artifact(sys.argv[1])
    new = load_artifact(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    co, cn = canary_median(old), canary_median(new)
    po, pn = cpu_canary_median(old), cpu_canary_median(new)
    if co and cn:
        print(
            f"overhead canary medians (sub-second set): old={co:.3f}s "
            f"new={cn:.3f}s ratio={cn / co:.2f}x — overhead drift only, "
            "NOT the normalization factor"
        )
    if po and pn:
        host = pn / po
        print(
            f"CPU-bound canary medians: old={po:.3f}s new={pn:.3f}s "
            f"host factor={host:.2f}x (new/old) — used for normalization"
        )
    elif co and cn:
        host = cn / co
        print(
            "no CPU-bound canary in one artifact; falling back to the "
            f"sub-second median ratio {host:.2f}x — overhead-biased, "
            "treat normalized flags as advisory"
        )
    else:
        print("no canary data in one of the artifacts; raw ratios only")
        host = 1.0
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
    # straggler flags (verdict-r12 item 4): bench.py records per-query
    # worst max/median task-duration ratios for walls >= 10 s; ratios
    # above SKEW_THRESHOLD mean one task dominated the stage — the
    # split-inheritance class the r11 sf10 sweep caught only by eye
    skew = new.get("task_skew") or {}
    skew_flagged = []
    for name, rec in sorted(skew.items()):
        ratio = rec["ratio"] if isinstance(rec, dict) else float(rec)
        if ratio > SKEW_THRESHOLD:
            detail = (
                f" (stage {rec['stage']}: median {rec['median_ms']:.0f}ms, "
                f"max {rec['max_ms']:.0f}ms over {rec['n_tasks']} tasks)"
                if isinstance(rec, dict)
                else ""
            )
            # a triage note on the recorded entry (quiet-host re-run
            # result, post-fix re-measure) rides along so a known
            # external-contention residue reading is never re-triaged
            # from scratch (ADVICE r13)
            note = rec.get("note") if isinstance(rec, dict) else None
            tag = f" [note: {note}]" if note else ""
            skew_flagged.append(
                f"  STRAGGLER {name}: ratio {ratio:.1f}x{detail}{tag}"
            )
    if skew:
        print(
            f"task-skew readings on {len(skew)} heavy queries; flagging "
            f"max/median > {SKEW_THRESHOLD:.0f}x:"
        )
        for line in skew_flagged:
            print(line)
        if not skew_flagged:
            print("  none — no stage exceeded the straggler threshold")
    t_old = sum(qo[n] for n in shared)
    t_new = sum(qn[n] for n in shared)
    if t_old > 0:
        print(
            f"shared-total: {t_old:.1f}s -> {t_new:.1f}s raw "
            f"({t_new / t_old:.2f}x), normalized {(t_new / t_old) / host:.2f}x"
        )
    else:
        print(f"shared-total: {t_old:.1f}s -> {t_new:.1f}s (no ratio: "
              "old total is zero)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
