#!/bin/bash
# sf10 rows for round 16 (verdict-r15 items 3 + 5): ann9e — the
# registry's only query without a second-decade reading until now —
# and dd2b, the LSH→verify family's budget-bounded twin. dd2 itself is
# hash-exact at sf10 since r14, so the capped verify is strictly
# cheaper for the oracle. Merge with tools/merge_sf10.py --round 16.
cd /root/repo
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-32g} \
CHECK_ORACLE_CPUS=${CHECK_ORACLE_CPUS:-24} \
CHECK_ORACLE_SPILL_CAP=${CHECK_ORACLE_SPILL_CAP:-60GB} \
python tools/check_oracle.py \
  --json "${1:-CORRECTNESS_SF10_r16_new.json}" --materialize \
  --oracle-timeout "${ORACLE_TIMEOUT:-1800}" \
  --duckdb-mem "${DUCKDB_MEM:-40GB}" \
  /root/repo/_scale/sf10 \
  ann9e_ivfpq_recall_held dd2b_ngram_jaccard_capped
