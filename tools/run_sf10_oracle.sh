#!/bin/bash
# sf10 correctness gate (verdict-r9 #1): strict oracle compare at the
# second measured decade. Incremental --json flush keeps every
# completed row if the wall expires. Reasoned skips: single-node
# DuckDB twin cost only (the Spark side of each skipped query still
# runs in the bench leg).
cd /root/repo
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} python tools/check_oracle.py \
  --json CORRECTNESS_SF10_r10.json --materialize --oracle-timeout 240 \
  --skip "dd12_minhash_estimate:oracle verifies every LSH candidate by definition (8.28M pairs needed 1800s at sf1; sf10 documents carry 10x bytes) - single-node DuckDB twin cost, not a Spark failure" \
  --skip "ann1_brute_topk:O(N^2 d) unnest oracle ~26G intermediate rows at sf10 in single-node DuckDB; Spark twin is the measured brute-force baseline in BENCH_r10_sf10" \
  /root/repo/_scale/sf10 "$@"
