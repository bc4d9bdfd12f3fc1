#!/bin/bash
# sf1 rows for round 16's new/changed queries (verdict-r15 item 5 +
# ADVICE-r15): dd2b (new — dd2's budget-bounded third-decade twin,
# md5-stratified 1/16 cap on verify pairs with the denominator in the
# row) and dd9 (oracle restructured AGAIN — single-evaluation pair dot
# via a CTE, so the hash is re-earned under the cheaper form).
cd /root/repo
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} python tools/check_oracle.py \
  --json "${1:-CORRECTNESS_SF1_r16_changed.json}" --materialize \
  --oracle-timeout "${ORACLE_TIMEOUT:-1800}" \
  /root/repo/_scale/sf1 \
  dd2b_ngram_jaccard_capped dd9_semantic_dedup
