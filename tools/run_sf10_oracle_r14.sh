#!/bin/bash
# sf10 correctness, round 14: the ann5b conversion leg (verdict-r13
# item 2). The oracle was restructured this round — pre-quantized
# BIGINT lists + list_dot_product replace the 64-way range unnest
# (benchqueries._ivf_sql), shrinking the quality tier's candidate
# stage from ~19.2G unnested rows to ~300M list ops (sf1: 18.6 s ->
# 0.6 s, value-identical at sf0.01/sf1 on both IVF tiers).
#
# ADVICE-r13 fix: every budget knob is env-overridable, including the
# DuckDB memory pin, so a documented measurement (e.g. a 40 GB run)
# is reproducible from this script as written:
#   ORACLE_TIMEOUT=1800 DUCKDB_MEM=80GB tools/run_sf10_oracle_r14.sh ann5b_ivf_quality
#
# Run queries ONE PER INVOCATION at this tier: an interrupted DuckDB
# query does not release its temp files until the connection closes,
# so a second query in the same process starts with the spill cap
# already consumed (r13 lesson).
cd /root/repo
Q="${1:?usage: run_sf10_oracle_r14.sh <query> [out.json]}"
OUT="${2:-CORRECTNESS_SF10_r14_new.json}"
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-32g} \
CHECK_ORACLE_CPUS=${CHECK_ORACLE_CPUS:-24} \
CHECK_ORACLE_SPILL_CAP=${CHECK_ORACLE_SPILL_CAP:-68GB} \
python tools/check_oracle.py \
  --json "$OUT" --materialize \
  --oracle-timeout "${ORACLE_TIMEOUT:-1800}" \
  --duckdb-mem "${DUCKDB_MEM:-80GB}" \
  /root/repo/_scale/sf10 "$Q"
