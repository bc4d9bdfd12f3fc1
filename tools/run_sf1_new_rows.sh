#!/bin/bash
# sf1 rows for the queries registered after CORRECTNESS_SF1_r07
# (verdict-r9 #2): the 6 r9 queries + the 4 r10 queries. The sf1 io
# fixtures exercise SAMPLE_THRESHOLD for real (6M members -> mod 16).
cd /root/repo
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} python tools/check_oracle.py \
  --json CORRECTNESS_SF1_r10_new.json --materialize --oracle-timeout 1800 \
  /root/repo/_scale/sf1 \
  s4d_shard_index_io g1c_assemble_batches_io d8_dsort_io \
  g4_batch_loader st1_dedup_stream_mirror m12_catalog_upsert \
  ann9c_ivfpq_refined_clustered m13_catalog_compact \
  p1b_pack_archive_io mm12_media_decode_io
