#!/bin/bash
# sf100 THIRD-DECADE oracle rows (verdict-r13 item 4): a1 and dd1 are
# the two scale-law rows whose DuckDB oracles stay single-node
# feasible at sf100 — both read only the 500k-row documents table
# (objects catalog CTE), so the third decade gets REAL hash-exact
# oracle rows, not just invariants. Run WITHOUT --materialize: the
# full catalog materialization would build the 1.2G-row members table
# these two queries never touch.
cd /root/repo
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-32g} \
CHECK_ORACLE_CPUS=${CHECK_ORACLE_CPUS:-24} \
python tools/check_oracle.py \
  --json "${1:-CORRECTNESS_SF100_r14.json}" \
  --oracle-timeout "${ORACLE_TIMEOUT:-1800}" \
  --duckdb-mem "${DUCKDB_MEM:-40GB}" \
  /root/repo/_scale/sf100 a1_bucket_summary dd1_exact_dedup
