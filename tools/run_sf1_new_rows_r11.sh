#!/bin/bash
# sf1 rows for the queries registered in round 11 (keeps the sf1
# ledger complete across CORRECTNESS_SF1_r07 + _r10_new + _r11_new):
# ann9d sqrt(N)-cell quality tier, the two budget-bounded baselines,
# and the real-HTTP downloader execution row.
cd /root/repo
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} python tools/check_oracle.py \
  --json CORRECTNESS_SF1_r11_new.json --materialize --oracle-timeout 1800 \
  /root/repo/_scale/sf1 \
  ann9d_ivfpq_sqrt_cells dd5b_embedding_neardup_sampled \
  dd12b_minhash_estimate_capped ds2b_download_http ds3b_download_etl_http
