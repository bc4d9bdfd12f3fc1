#!/bin/bash
# sf10 rows for round 15's changed queries: the 39 member-name-contract
# queries (lpad(orderkey, 9) widening — their sf10 hashes all changed)
# plus the new ann9e. Batched under the materialized catalogs (one
# members build shared by all rows); the heavy io/dsort rows ran green
# at sf10 under this exact machinery in r13/r14. dd9 runs separately
# (tools/run_sf10_oracle_r14.sh) — its skip is final, see merge_sf10.
cd /root/repo
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-32g} \
CHECK_ORACLE_CPUS=${CHECK_ORACLE_CPUS:-24} \
CHECK_ORACLE_SPILL_CAP=${CHECK_ORACLE_SPILL_CAP:-60GB} \
python tools/check_oracle.py \
  --json "${1:-CORRECTNESS_SF10_r15_new2.json}" --materialize \
  --oracle-timeout "${ORACLE_TIMEOUT:-1800}" \
  --duckdb-mem "${DUCKDB_MEM:-40GB}" \
  /root/repo/_scale/sf10 \
  f1_prefix_ext_breakdown f2_template_select f3_explicit_names \
  f4_regex_modes f6_size_dispatch s4_archive_listing s4b_zip_listing \
  s4c_lz4_listing s8_range_reads p2_extract_member p3_extract_regex_pack \
  p4_archive_append j2_ekm_route j5_group_records g2_coloc_routing \
  t3_multiobj_transform a2_shard_summary a5_duplicate_records \
  d3_seeded_shuffle d4_md5_order d5_reshard d7_topk_largest \
  d2_sort_content_int d2f_sort_content_float d2s_sort_content_string \
  j1_get_batch j1b_mixed_entries g1_assemble_batches g1_mixed_batches \
  g3_output_formats g4_batch_loader p1_pack_archive d1_sort_alphanumeric \
  d6_pack_shards dsort_pipeline s4d_shard_index_io g1c_assemble_batches_io \
  d8_dsort_io p1b_pack_archive_io ann9e_ivfpq_recall_held
