"""Invariants of the driver contract in __spark_entry__.py.

The driver's correctness ledger covers exactly the first 50 entries of
queries() (observed rounds 1-5), so the curated front of the ordering
IS the hard-signal surface. Round 6 finishes the rotation: the front
50 are the 30 queries the r4/r5 ledgers never checked (new + residue)
plus 20 high-risk re-checks, so rounds 4-6 combined hard-verify EVERY
registered query's current implementation.
"""

from __future__ import annotations

import json
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent


def _checked_r4_r5() -> set[str]:
    names: set[str] = set()
    for ledger in sorted(REPO.glob("CORRECTNESS_r0[4-5].json")):
        names |= set(json.loads(ledger.read_text()))
    return names


def test_priority_is_exactly_the_first_50():
    p = entry.DRIVER_CHECK_PRIORITY
    qs = entry.queries()
    assert len(p) == 50
    assert len(set(p)) == 50
    assert all(n in qs for n in p)
    assert list(qs)[:50] == p


def test_front_loads_every_query_r4_r5_never_checked():
    """Part (a) of the round-6 rotation: every registered query absent
    from BOTH the r4 and r5 ledgers must sit in the front 50 — after
    this round there is no registered query whose CURRENT form lacks a
    driver hard-check across rounds 4-6."""
    checked = _checked_r4_r5()
    assert checked, "committed CORRECTNESS_r04/r05.json ledgers missing"
    never = set(entry.queries()) - checked
    outside = sorted(never - set(entry.DRIVER_CHECK_PRIORITY))
    assert outside == [], f"never-checked but not front-loaded: {outside}"


def test_recheck_slots_include_the_verdict_shortlist():
    """Part (b): the slots left after the never-checked set must carry
    the round-5 verdict's named high-risk re-checks."""
    p = set(entry.DRIVER_CHECK_PRIORITY)
    for name in (
        "dd2_ngram_jaccard",
        "g3_output_formats",
        "dd7_dup_groups",
        "dsort_pipeline",
        "g1_assemble_batches",
        "g1_mixed_batches",
        "p1_pack_archive",
    ):
        assert name in p, f"verdict-r5 re-check missing from front 50: {name}"


def test_rounds_4_to_6_cover_every_registered_query():
    """The union of the r4/r5 ledgers and this round's front 50 is the
    ENTIRE registration — the 'all 129 hard-verified across rounds
    4-6' goal, machine-checked."""
    covered = _checked_r4_r5() | set(entry.DRIVER_CHECK_PRIORITY)
    missing = sorted(set(entry.queries()) - covered)
    assert missing == [], f"queries with no driver check in r4-r6: {missing}"


def test_no_stub_backed_registrations():
    """Verdict-r5 item 8: the digest-stub plumbing rows (mm1-mm4) and
    the tx5 regex approximation are retired from queries(); their
    contracts live in tests/test_stub_plumbing.py."""
    qs = set(entry.queries())
    for name in (
        "mm1_decode_media",
        "mm2_resize",
        "mm3_feature_extract",
        "mm4_frame_sample",
        "tx5_bpe_tokens",
    ):
        assert name not in qs
    from aistore_spark.benchqueries import STUB_PLUMBING_QUERIES

    assert set(STUB_PLUMBING_QUERIES) == {
        "mm1_decode_media",
        "mm2_resize",
        "mm3_feature_extract",
        "mm4_frame_sample",
    }


def test_every_query_has_an_oracle():
    # zero rows-only entries: every registered query is hash-checkable
    # (the xxhash64 HRW form is unregistered by design — see
    # placement.hrw_placement_xxhash / j4b_hrw_md5)
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(qs) - set(oracles) == set()
