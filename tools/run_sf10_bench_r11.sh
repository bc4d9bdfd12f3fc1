#!/bin/bash
# sf10 bench leg, round 11: re-measure ONLY the rows whose code changed
# since the r10 sweep (the five spread()-fixed single-core-scan victims
# tx10/tx4/tx12/dd8/ann2; dd1, whose r10 artifact wall predates its
# fix; ann5/ann5b, whose scoring join got the round-robin repartition)
# and the five queries registered this round (ann9d, dd5b, dd12b,
# ds2b, ds3b). Everything else resumes from BENCH_r10_sf10's measured
# walls — byte-identical code does not need a second decade re-pay.
# The resume file is BENCH_r10_sf10.json parsed minus those 13 names
# (see NOTES_r11.md); single pass, 600 s cancel budget, same knobs as
# the r10 sweep.
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/repo/_scale/sf10 \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_QUERY_TIMEOUT=600 \
SPARK_GRAFT_BENCH_RESUME=${SPARK_GRAFT_BENCH_RESUME:-/tmp/bench_sf10_resume.json} \
SPARK_GRAFT_BENCH_PARTIAL=/tmp/bench_sf10_r11_partial.json \
SPARK_GRAFT_BENCH_FULL=BENCH_r11_sf10.json \
python bench.py
