"""End-to-end LLM training-data pipeline on this engine.

The workflow a data-curation team runs before every pretraining batch:
dedup → quality gates → decontaminate → split → pack → export shards,
each stage a declarative DataFrame op from `aistore_spark.operators`.
Run:

    python examples/training_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from aistore_spark.operators import dedup, dsort, sampling, text
from aistore_spark.session import get_spark
from aistore_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training_pipeline", cpus=8)
    docs = load_table(spark, sf_dir, "documents")

    # 1. exact dedup: one canonical doc per content hash
    canon = dedup.exact_dedup(docs).filter(~F.col("is_dup")).select("doc_id")
    docs1 = docs.join(canon, "doc_id", "left_semi")
    print(f"dedup: {docs.count()} -> {docs1.count()} docs")

    # 2. near-dup removal, the scale path: MinHash-LSH candidates ->
    #    exact Jaccard verify on candidates only -> transitive groups
    from aistore_spark.util import pin

    sh = pin(dedup.shingles(docs1))
    cand = dedup.lsh_candidate_pairs(docs1, shingles_df=sh)
    pairs = dedup.jaccard_verify(
        docs1, cand, threshold_num=1, threshold_den=5, shingles_df=sh
    )
    groups = dedup.dup_groups(pairs)
    near_dups = groups.filter(F.col("doc_id") != F.col("group_id"))
    docs2 = docs1.join(near_dups.select("doc_id"), "doc_id", "left_anti")
    print(f"near-dup: dropped {near_dups.count()} (candidates {cand.count()})")

    # 3. quality gates: Gopher rules + repetition filters + bigram-LM
    #    familiarity floor (drops garbled text whose bigrams appear
    #    nowhere else in the corpus)
    keep_q = text.gopher_quality(docs2).filter("keep").select("doc_id")
    keep_r = text.repetition_stats(docs2).filter("keep").select("doc_id")
    keep_f = (
        text.bigram_familiarity(docs2)
        .filter(F.col("mean_familiarity") >= 1)
        .select("doc_id")
    )
    docs3 = (
        docs2.join(keep_q, "doc_id", "left_semi")
        .join(keep_r, "doc_id", "left_semi")
        .join(keep_f, "doc_id", "left_semi")
    )
    print(f"quality: -> {docs3.count()} docs")

    # 4. decontaminate against a held-out eval set (here: every 97th doc)
    evalset = docs.filter(F.col("doc_id") % 97 == 0)
    hits = dedup.decontaminate(docs3, evalset)
    docs4 = docs3.join(hits.select("doc_id"), "doc_id", "left_anti")
    print(f"decontamination: dropped {docs3.count() - docs4.count()}")

    # 5. reproducible train/val/test split (hash-bucket, survives reruns)
    split = sampling.hash_split(
        docs4.withColumn("name", F.col("doc_id").cast("string")),
        {"train": 98, "val": 1, "test": 1},
    )
    split.groupBy("split").count().show()

    # 6. pack the train split into byte-budget export shards
    train = split.filter(F.col("split") == "train").select(
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("doc_key"),
        F.col("n_chars").cast("bigint").alias("bytes"),
    )
    packed = dsort.pack_shards(train, ["doc_key"], "bytes", shard_size=1 << 16)
    manifest = dsort.shard_manifest(packed, item_col="doc_key", size_col="bytes")
    print("export shards:")
    manifest.orderBy("shard_id").show(10, truncate=False)

    # 7. deliver transformed bytes straight to their destination owner
    #    (direct-put: one shuffle keyed by HRW owner; the manifest rides
    #    the same exchange)
    from aistore_spark.operators import etl

    kept = docs.join(split.filter("split = 'train'").select("doc_id"), "doc_id")
    with_data = kept.select(
        F.concat(F.lit("train/"), F.col("doc_id").cast("string"), F.lit(".txt"))
        .alias("name"),
        F.encode("text", "UTF-8").alias("data"),
    )
    delivery = etl.etl_offline_direct(with_data, ["compress"], n_targets=8)
    print("direct-put delivery manifest (per destination target):")
    delivery.orderBy("dst_target").show(8, truncate=False)


if __name__ == "__main__":
    main()
