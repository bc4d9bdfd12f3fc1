#!/bin/bash
# Round-closing artifact ritual (verdict-r12 item 3 — the hygiene nit
# that went five rounds unenforced). Usage: tools/close_round.sh N
#
# 1. refresh tests/driver_green_fps.json from the round's driver
#    ledger (CORRECTNESS_rN.json), so every driver-green query's
#    fingerprint is pinned;
# 2. commit the round's driver artifacts (BENCH_rN.json,
#    CORRECTNESS_rN.json) plus the fps snapshot;
# 3. fail LOUDLY if git status is still dirty afterward — a dirty
#    tree at round close is the bug this script exists to kill.
set -euo pipefail
cd /root/repo

N="${1:?usage: tools/close_round.sh <round-number>}"
LEDGER="CORRECTNESS_r$(printf '%02d' "$N").json"
[[ -f "$LEDGER" ]] || LEDGER="CORRECTNESS_r${N}.json"
BENCH="BENCH_r$(printf '%02d' "$N").json"
[[ -f "$BENCH" ]] || BENCH="BENCH_r${N}.json"

if [[ -f "$LEDGER" ]]; then
  python tools/query_fps.py --update-green "$LEDGER"
else
  echo "close_round: no $LEDGER yet (driver not run?) — skipping fps refresh" >&2
fi

to_add=()
for f in "$LEDGER" "$BENCH" tests/driver_green_fps.json; do
  [[ -f "$f" ]] && to_add+=("$f")
done
git add -- "${to_add[@]}"
# any other sf/bench artifacts of this round left around loose
git add -- "CORRECTNESS_SF10_r${N}.json" "BENCH_r${N}_sf10.json" \
  "CORRECTNESS_SF1_r${N}"*.json 2>/dev/null || true

if ! git diff --cached --quiet; then
  git commit -m "round ${N}: close-out artifacts (driver ledger, bench, fps snapshot)"
fi

if [[ -n "$(git status --porcelain)" ]]; then
  echo "close_round: TREE STILL DIRTY after close — fix before round end:" >&2
  git status --short >&2
  exit 1
fi
echo "close_round: clean tree, round ${N} artifacts committed."
