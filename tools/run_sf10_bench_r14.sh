#!/bin/bash
# sf10 bench leg, round 14 (verdict-r13 item 3): fresh walls + task
# skew readings for the 60-120 s tier — the band containing every
# ANN/text/multimodal family member measured before the skew probe
# existed (r11) and so carrying no decade-scale skew evidence. All
# other rows resume from BENCH_r13_sf10.json (provenance-tagged in
# resumed_queries; their r13 skew readings ride along). Run on a QUIET
# host — concurrent legs are the documented residue class (NOTES_r13).
set -euo pipefail
cd /root/repo
python - <<'EOF'
import json
TIER = [
    "ann5b_ivf_quality", "dd10_substring_spans", "tx12_hashed_classifier",
    "p1b_pack_archive_io", "dd6_simhash_pairs", "a2_shard_summary",
    "dd12b_minhash_estimate_capped", "ann6b_kmeans_train",
    "ann3b_lsh_multiprobe", "a5_duplicate_records", "g1_mixed_batches",
    "j2_ekm_route", "dd3_lsh_candidates", "d6_pack_shards",
]
b = json.load(open("BENCH_r13_sf10.json"))
resume = {
    "queries": {k: v for k, v in b["queries"].items() if k not in TIER},
    "errors": {k: v for k, v in b.get("errors", {}).items() if k not in TIER},
    "task_skew": b.get("task_skew", {}),
}
json.dump(resume, open("/tmp/bench_sf10_r14_resume.json", "w"))
print(f"resume file: {len(resume['queries'])} walls, "
      f"{len(resume['errors'])} errors; {len(TIER)} tier rows run fresh")
EOF
SPARK_GRAFT_SF_DIR=/root/repo/_scale/sf10 \
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_QUERY_TIMEOUT=600 \
SPARK_GRAFT_BENCH_RESUME=/tmp/bench_sf10_r14_resume.json \
SPARK_GRAFT_BENCH_PARTIAL=${SPARK_GRAFT_BENCH_PARTIAL:-/tmp/bench_sf10_r14_partial.json} \
python bench.py | tail -1 > BENCH_r14_sf10.json
echo "wrote BENCH_r14_sf10.json"
