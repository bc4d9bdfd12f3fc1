#!/bin/bash
# sf10 correctness, round 13 leg 3 (the raised-budget retries that
# produced the final 168/177 ledger). DuckDB memory pin defaults to
# the 80 GB the final retries used; override with DUCKDB_MEM=40GB to
# reproduce the 40 GB readings in the table below.
# Budgets per query, as measured:
#   dd6b  — 900 s cap, 40 GB pin            -> hash-exact (634 s)
#   ann3b — 1800 s cap, 80 GB pin           -> hash-exact
#   ann8  — 1800 s cap, 80 GB pin           -> hash-exact (1226 s,
#           out-of-core; r11 had classed its 1.6 G-row ADC twin
#           measured-infeasible)
#   dd9   — spill-wall at BOTH pins (46.5 GiB temp @ 40 GB mem,
#           63.3 GiB @ 80 GB mem, 68 GB cap) -> measured-infeasible
#   pipe3 — OOM 74.5 GiB/74.5 GiB pinned agg @ 80 GB pin (r11:
#           37.2 GiB @ 40 GB)                -> measured-infeasible
#   ann5b — 1500 s timeout @ 80 GB pin, 60 GB spilled -> convertible,
#           carries the fresh measured attempt
# Run queries ONE PER INVOCATION at this tier: an interrupted DuckDB
# query does not release its temp files until the connection closes,
# so a second query in the same process starts with the spill cap
# already consumed (observed live: dd9's 61 GB starved ann3b's first
# attempt).
cd /root/repo
Q="${1:?usage: run_sf10_oracle_r13c.sh <query> [out.json]}"
OUT="${2:-CORRECTNESS_SF10_r13_new_retry.json}"
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-32g} \
CHECK_ORACLE_CPUS=${CHECK_ORACLE_CPUS:-24} \
CHECK_ORACLE_SPILL_CAP=${CHECK_ORACLE_SPILL_CAP:-68GB} \
python tools/check_oracle.py \
  --json "$OUT" --materialize \
  --oracle-timeout "${ORACLE_TIMEOUT:-1800}" --duckdb-mem "${DUCKDB_MEM:-80GB}" \
  /root/repo/_scale/sf10 "$Q"
