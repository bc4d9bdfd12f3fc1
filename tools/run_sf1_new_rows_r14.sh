#!/bin/bash
# sf1 rows for round 14's new/changed queries: the downloader
# job-status rollup (ds2d, verdict-r13 item 7), the refactored ds2c
# it shares its pipeline with, and the IVF pair whose oracle moved to
# pre-quantized list_dot_product (benchqueries._ivf_sql, r14).
cd /root/repo
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} python tools/check_oracle.py \
  --json CORRECTNESS_SF1_r14_new.json --materialize --oracle-timeout 1800 \
  /root/repo/_scale/sf1 \
  ds2c_download_errors ds2d_download_status ann5_ivf_topk ann5b_ivf_quality
