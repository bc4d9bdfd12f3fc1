"""Per-query implementation fingerprints for the driver-rotation
contract (verdict-r6 item 7).

A query's fingerprint is md5(oracle SQL + the registered function's
source). tests/test_driver_contract.py compares current fingerprints
against tests/driver_green_fps.json — the snapshot of each query's
fingerprint AS OF its last driver-green ledger row — and requires any
changed or never-green query to appear in the front 50 of
DRIVER_CHECK_PRIORITY, so a silent re-implementation can never ride on
an old hard-green.

Boundary (documented, deliberate): the fingerprint covers the
registered function body and its oracle SQL, not the operator modules
they call into — operator-level changes are guarded by the pytest
suite and the full strict local gate, while THIS contract guards the
query/oracle pair the driver hashes.

Usage:
  python tools/query_fps.py                # print current fps as JSON
  python tools/query_fps.py --update-green LEDGER.json
        # refresh tests/driver_green_fps.json entries for every query
        # the given driver ledger shows hash-green (run at round start
        # when a new CORRECTNESS_r0N.json lands)
"""

from __future__ import annotations

import ast
import hashlib
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SNAPSHOT = REPO / "tests" / "driver_green_fps.json"


def current_fps() -> dict[str, str]:
    from aistore_spark.benchqueries import ORACLES, QUERIES

    # QUERIES holds the register() wrapper, whose inspect.getsource is
    # the same 5 lines for every query — take the REAL function body
    # from the module AST by name instead.
    src_text = (REPO / "aistore_spark" / "benchqueries.py").read_text()
    segs = {
        node.name: ast.get_source_segment(src_text, node)
        for node in ast.parse(src_text).body
        if isinstance(node, ast.FunctionDef)
    }
    out = {}
    for name, fn in QUERIES.items():
        sql = ORACLES.get(name, "")
        src = segs.get(fn.__name__) or ""
        if not src:
            raise RuntimeError(f"no top-level def found for query {name}")
        out[name] = hashlib.md5((sql + "\n####\n" + src).encode()).hexdigest()
    return out


def update_green(ledger_path: str) -> None:
    ledger = json.loads(Path(ledger_path).read_text())
    snap = json.loads(SNAPSHOT.read_text()) if SNAPSHOT.exists() else {}
    fps = current_fps()
    n = 0
    for name, rec in ledger.items():
        if rec.get("hash_match") and name in fps:
            snap[name] = fps[name]
            n += 1
    SNAPSHOT.write_text(json.dumps(dict(sorted(snap.items())), indent=2) + "\n")
    print(f"updated {n} green fingerprints -> {SNAPSHOT}")


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--update-green":
        update_green(sys.argv[2])
        return 0
    print(json.dumps(dict(sorted(current_fps().items())), indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
