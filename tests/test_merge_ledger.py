"""Ledger-tooling regression tests (verdict-r12 items 5 and 7).

The sf10 merge must never let a mismatch row hide: a failed oracle
comparison in ``tools/check_oracle.py`` has to carry a truthy ``err``
and ``tools/merge_sf10.py`` has to classify any non-green, non-skip,
non-rows-only row as a failure and exit nonzero.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from merge_sf10 import classify, partial_key  # noqa: E402


def test_classify_green_skip_rows_only():
    assert classify({"hash_match": True, "err": None}) == "green"
    assert classify({"hash_match": None, "err": "skipped: oracle cost"}) == "skip"
    assert (
        classify({"hash_match": None, "err": "no oracle (rows-only by design)"})
        == "rows_only"
    )


def test_classify_mismatch_rows_are_failures():
    # the silent-hole class verdict-r12 "what's wrong" #2 names: a row
    # where the comparison ran and failed. With the check_oracle fix
    # err is truthy; but even a legacy null-err row must classify as a
    # failure, never as "neither".
    assert classify({"hash_match": False, "err": "rows: 10 vs 11"}) == "failure"
    assert classify({"hash_match": False, "err": "schema: [...] vs [...]"}) == "failure"
    assert classify({"hash_match": False, "err": "value mismatch"}) == "failure"
    assert classify({"hash_match": False, "err": None}) == "failure"
    assert classify({"rows_match": True, "schema_match": True,
                     "hash_match": False, "err": None}) == "failure"


def test_partial_key_orders_new_suffixes():
    names = ["CORRECTNESS_SF10_r13_new10.json", "CORRECTNESS_SF10_r13_new.json",
             "CORRECTNESS_SF10_r13_new2.json"]
    ordered = sorted((Path(n) for n in names), key=partial_key)
    assert [p.name for p in ordered] == [
        "CORRECTNESS_SF10_r13_new.json",
        "CORRECTNESS_SF10_r13_new2.json",
        "CORRECTNESS_SF10_r13_new10.json",
    ]


def test_check_oracle_sets_err_on_mismatch_paths():
    """The row-count and schema mismatch paths must write rec['err']
    (tools/check_oracle.py) — source-level pin so a refactor that
    reintroduces the silent null-err row fails here."""
    src = (REPO / "tools" / "check_oracle.py").read_text()
    assert 'rec["err"] = f"rows: {len(sdf)} vs {len(odf)}"' in src
    assert 'rec["err"] = f"schema:' in src


def test_merge_exits_nonzero_on_forced_mismatch(tmp_path):
    """End-to-end: a ledger partial with a mismatch row makes the merge
    exit nonzero and report the row as a FAILURE."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    base = {
        n: {"rows_match": True, "schema_match": True, "hash_match": True,
            "err": None}
        for n in names
    }
    # round 98 base ledger, round 99 partial that regresses one row
    # with the legacy null err — the exact silent-hole shape
    bad = names[0]
    partial = {bad: {"rows_match": False, "schema_match": True,
                     "hash_match": False, "err": None}}
    (REPO / "CORRECTNESS_SF10_r98.json").write_text(json.dumps(base))
    (REPO / "CORRECTNESS_SF10_r99_new.json").write_text(json.dumps(partial))
    try:
        proc = subprocess.run(
            [sys.executable, "tools/merge_sf10.py", "--round", "99",
             "--base", "CORRECTNESS_SF10_r98.json"],
            cwd=REPO, capture_output=True, text=True, timeout=120,
        )
        assert proc.returncode != 0, proc.stdout + proc.stderr
        assert "FAILURES" in proc.stdout and bad in proc.stdout
        merged = json.loads((REPO / "CORRECTNESS_SF10_r99.json").read_text())
        assert merged[bad]["hash_match"] is False
        assert len(merged) == len(names)
    finally:
        for f in ("CORRECTNESS_SF10_r98.json", "CORRECTNESS_SF10_r99_new.json",
                  "CORRECTNESS_SF10_r99.json"):
            (REPO / f).unlink(missing_ok=True)


def test_skip_taxonomy_is_pinned_to_the_rows():
    """Verdict-r13 item 6: the skip taxonomy lives in merge_sf10's
    hand-maintained SKIP_KINDS dict, so (a) a registry rename must not
    silently orphan a taxonomy entry, and (b) every skip row in the
    newest merged sf10 ledger must carry a kind — a kindless skip is
    the 'convertible' backlog, which round 14 emptied (ann5b)."""
    import re

    import __spark_entry__ as entry
    from merge_sf10 import SKIP_KINDS, classify

    registered = set(entry.queries())
    orphaned = sorted(set(SKIP_KINDS) - registered)
    assert orphaned == [], (
        f"SKIP_KINDS names not in the registry (rename?): {orphaned}"
    )

    merged = [
        p for p in REPO.glob("CORRECTNESS_SF10_r*.json")
        if re.fullmatch(r"CORRECTNESS_SF10_r\d+\.json", p.name)
    ]
    assert merged, "no merged sf10 ledger committed"
    newest = max(merged, key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)))
    ledger = json.loads(newest.read_text())
    kindless = sorted(
        n for n, rec in ledger.items()
        if classify(rec) == "skip"
        and n not in SKIP_KINDS
        # r15: a renamed-contract row whose sf10 re-attempt did not fit
        # the round carries its own explanation (prior_green = the
        # round whose hash-exact row attested the OLD names) — that IS
        # the convertible backlog, explicitly tagged, not a kindless
        # hole. Anything else unexplained still fails.
        and not rec.get("prior_green")
    )
    assert kindless == [], (
        f"{newest.name}: skip rows without a taxonomy kind: {kindless}"
    )


def test_resumed_provenance_excludes_fresh_partial_walls():
    # verdict-r14 item 5: the r14 sf10 sweep crashed mid-run and
    # resumed from its own partial; the partial's FRESH walls (measured
    # this round) were blanket-tagged resumed. A partial resume must
    # tag only the names the partial itself inherited.
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    # bench.py imports spark-session helpers at module level but does
    # not start a session until main(); importing is cheap and safe
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    partial = {
        "partial": True,
        "queries": {"ann5b": 126.8, "tx12": 111.3, "old_row": 3.0},
        "errors": {"dd9": "timeout"},
        # only old_row was inherited by the crashed process
        "resumed_queries": ["old_row"],
    }
    assert bench.resumed_provenance(partial) == ["old_row"]

    # a COMPLETED prior artifact (no partial flag) still tags all rows
    done = {"queries": {"a": 1.0, "b": 2.0}, "errors": {"c": "x"}}
    assert bench.resumed_provenance(done) == ["a", "b", "c"]

    # legacy partial without the new provenance list: nothing can be
    # proven inherited, so nothing is tagged (walls stay, tag drops)
    legacy = {"partial": True, "queries": {"a": 1.0}, "errors": {}}
    assert bench.resumed_provenance(legacy) == []
