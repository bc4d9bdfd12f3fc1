#!/bin/bash
# sf10 correctness, round 13 leg 2: (a) the new ds2c_download_errors
# row (per-item downloader error semantics — fixed 6,250-item fixture
# workload, SF-invariant); (b) a FRESH measured attempt on
# ann3b_lsh_multiprobe, the one remaining convertible skip not in
# leg 1 — r11 measured its DuckDB twin past a 600 s cap; this leg
# raises the cap to 1800 s with the 40 GB memory pin + spill dir. If
# it still times out, the ledger row carries this measured attempt,
# not a 240 s prediction (verdict-r12 item 1 done-criterion).
cd /root/repo
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} \
CHECK_ORACLE_CPUS=${CHECK_ORACLE_CPUS:-24} \
python tools/check_oracle.py \
  --json CORRECTNESS_SF10_r13_new2.json --materialize \
  --oracle-timeout 1800 --duckdb-mem 40GB \
  /root/repo/_scale/sf10 \
  ds2c_download_errors \
  ann3b_lsh_multiprobe \
  "$@"
