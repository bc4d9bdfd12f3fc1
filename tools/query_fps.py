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

Sentinel extension (r17, verdict-r16 item 2): that boundary left a
hole — r16's session-memo commit changed code EVERY query executes
(sources/tables.py, the shared catalog view builders) and rotated
nothing into the front 50. A small SENTINEL set now folds the shared
helper sources into its fingerprints (HELPER_SENTINELS below), so any
change to those helpers forces the sentinels back into the driver's
hash window. Sentinels, not all queries: folding helpers into every
fingerprint would demand 180 front-50 slots the contract does not
have; one driver-hashed row per helper family is the guarantee the
rotation can actually deliver.

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

#: sentinel query -> helper sources folded into ITS fingerprint.
#: p2 covers the table-loading/session seams every query constructs
#: through; p4 covers the archive/tar kernels the io family executes;
#: s4b covers the shared catalog view derivations (catalog.py + the
#: _objects/_members/_requests/_io_members builders in
#: benchqueries.py, matched by AST name below).
HELPER_SENTINELS: dict[str, list[str]] = {
    "p2_extract_member": [
        "aistore_spark/sources/tables.py",
        "aistore_spark/util.py",
        "aistore_spark/session.py",
    ],
    "p4_archive_append": [
        "aistore_spark/sources/binary.py",
        "aistore_spark/operators/archive.py",
    ],
    "s4b_zip_listing": [
        "aistore_spark/catalog.py",
    ],
}

#: benchqueries-level shared view builders folded into s4b's
#: fingerprint by function name (they live outside any registered body)
_VIEW_BUILDER_FNS = ("_objects", "_remote", "_members", "_requests",
                     "_io_members")


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
        material = sql + "\n####\n" + src
        for helper in HELPER_SENTINELS.get(name, ()):
            material += "\n####\n" + (REPO / helper).read_text()
        if name == "s4b_zip_listing":
            for fn_name in _VIEW_BUILDER_FNS:
                material += "\n####\n" + (segs.get(fn_name) or "")
        out[name] = hashlib.md5(material.encode()).hexdigest()
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
