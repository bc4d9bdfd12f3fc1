"""Post-r15-merge ledger hygiene: the lpad(orderkey, 9) widening
changed the VALUES of 39 member-name queries, so their pre-r15 sf10
hash-green rows no longer attest the current output. Any such row in
the merged r15 sf10 ledger that was NOT re-attempted this round (its
``source`` still points at an older round) must not present as green —
rewrite it as an explicit rows-only-style annotation keeping the prior
evidence visible.

Usage: python tools/stale_renamed_rows.py CORRECTNESS_SF10_r15.json
Exits 0 and prints what it rewrote (possibly nothing).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

RENAMED = [
    "dsort_pipeline", "d1_sort_alphanumeric", "d2_sort_content_int",
    "d2f_sort_content_float", "d2s_sort_content_string",
    "d3_seeded_shuffle", "d4_md5_order", "d5_reshard", "d6_pack_shards",
    "d7_topk_largest", "d8_dsort_io", "j1_get_batch",
    "j1b_mixed_entries", "j2_ekm_route", "j5_group_records",
    "g1_assemble_batches", "g1_mixed_batches", "g1c_assemble_batches_io",
    "g2_coloc_routing", "g3_output_formats", "g4_batch_loader",
    "p1_pack_archive", "p1b_pack_archive_io", "p2_extract_member",
    "p3_extract_regex_pack", "p4_archive_append", "s4_archive_listing",
    "s4b_zip_listing", "s4c_lz4_listing", "s4d_shard_index_io",
    "s8_range_reads", "a2_shard_summary", "a5_duplicate_records",
    "f1_prefix_ext_breakdown", "f2_template_select", "f3_explicit_names",
    "f4_regex_modes", "f6_size_dispatch", "t3_multiobj_transform",
]


def main() -> int:
    p = Path(sys.argv[1])
    d = json.loads(p.read_text())
    rewrote = []
    for name in RENAMED:
        rec = d.get(name)
        if not rec:
            continue
        src = str(rec.get("source") or "")
        # rows written this round carry no source tag (merge adds it
        # only when carrying forward). Match the round tag precisely —
        # a substring test would also hit e.g. "r150" (ADVICE-r15) —
        # and treat any round >= 15 as fresh (post-widening).
        m = re.search(r"(?<![0-9a-zA-Z])r(\d+)(?![0-9])", src)
        fresh = not src or (m is not None and int(m.group(1)) >= 15)
        if rec.get("hash_match") is True and not fresh:
            d[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": rec.get("spark_rows"),
                "oracle_rows": None,
                "err": (
                    "skipped: sf10 row not re-attempted after the r15 "
                    "member-name widening (lpad 8->9 changed this "
                    "query's values; the pre-r15 hash-green row below "
                    "attested the OLD names). Fresh sf1 hash-exact in "
                    "CORRECTNESS_SF1_r15_changed.json; prior sf10 "
                    f"evidence: hash-exact in {src or 'an earlier round'}."
                ),
                "skip_kind": "convertible",
                "prior_green": src or "pre-r15",
            }
            rewrote.append(name)
    if rewrote:
        p.write_text(json.dumps(d, indent=1) + "\n")
    print(f"rewrote {len(rewrote)} stale renamed rows: {rewrote}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
