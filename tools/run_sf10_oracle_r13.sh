#!/bin/bash
# sf10 correctness, round 13 (verdict-r12 item 1): convert the six
# 240s-cap oracle skips to hash-exact using the proven recipe from
# r11's dd6/dd10/pipe4 conversions — raised oracle cap (900s) plus a
# pinned DuckDB memory budget with a spill dir. ann9d (the sqrt(N)
# scale-law flagship) runs first. Rows land incrementally in
# CORRECTNESS_SF10_r13_new.json; merge with
#   python tools/merge_sf10.py --round 13
cd /root/repo
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
CHECK_ORACLE_CPUS=${CHECK_ORACLE_CPUS:-24} \
python tools/check_oracle.py \
  --json CORRECTNESS_SF10_r13_new.json --materialize \
  --oracle-timeout 900 --duckdb-mem 40GB \
  /root/repo/_scale/sf10 \
  ann9d_ivfpq_sqrt_cells \
  dd8_decontaminate \
  dd12b_minhash_estimate_capped \
  ann5b_ivf_quality \
  dd9_semantic_dedup \
  dd6b_simhash_prod \
  "$@"
