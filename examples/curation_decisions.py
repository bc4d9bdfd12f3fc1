"""End-to-end curation DECISION pipeline over the newest operators:

    quality gate (pipe4: exact-dup canonicality + hashed classifier +
    duplicated-substring share)
      -> temperature-balanced sampling of the kept docs (samp4)
      -> sliding context windows over the sampled docs (tok3)
      -> novelty report of the incoming half vs the reference half
         (tx14) and a Bloom seen-before probe (dd11 shape)

Run:  python examples/curation_decisions.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window
from pyspark.sql import functions as F

from aistore_spark.operators import dedup, sampling, text
from aistore_spark.session import get_spark
from aistore_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation_decisions", cpus=8)
    docs = load_table(spark, sf_dir, "documents")

    # 1. per-doc keep/drop with reason bits -------------------------------
    weights = text.hashed_weights(spark, n_buckets=4096, seed="w0")
    cls = text.hashed_linear_score(docs, weights, n_buckets=4096)
    spans = dedup.dup_substring_spans(docs, k=8, min_count=2)
    canon = docs.select(
        "doc_id",
        "source",
        F.when(
            F.min("doc_id").over(Window.partitionBy(F.md5("text")))
            == F.col("doc_id"),
            1,
        ).otherwise(0).alias("is_canonical"),
    )
    gate = (
        canon.join(cls.select("doc_id", "label"), "doc_id")
        .join(spans.select("doc_id", "dl", "dup_tokens"), "doc_id")
        .withColumn(
            "keep",
            (F.col("is_canonical") == 1)
            & (F.col("label") == 1)
            & (F.col("dup_tokens") * 5 <= F.col("dl")),
        )
    )
    kept = gate.where("keep").select("doc_id", "source")
    print("kept:", kept.count(), "of", docs.count())

    # 2. temperature-rebalance the kept docs ------------------------------
    mixed = sampling.temperature_mixture(kept, scale=4)
    print(
        "mixture rows:",
        mixed.count(),
        "sources:",
        mixed.select("source").distinct().count(),
    )

    # 3. context windows over the kept docs -------------------------------
    windows = sampling.sliding_windows(
        docs.join(kept.select("doc_id"), "doc_id", "left_semi"),
        window=32,
        stride=24,
    )
    print("context windows:", windows.count())

    # 4. incremental-ingest novelty: new half vs reference half -----------
    c = docs.select("doc_id", "source", F.md5("text").alias("digest"))
    build = c.where(F.length("source") == 4).select("digest")
    probe = c.where(F.length("source") == 5).select("doc_id", "digest")
    seen = dedup.bloom_probe(build, probe, m_bits=1024, k=5)
    print(
        "bloom: probes =", seen.count(),
        "hits =", seen.where("bloom_hit = 1").count(),
        "true dups =", seen.where("actual_dup = 1").count(),
    )


if __name__ == "__main__":
    main()
