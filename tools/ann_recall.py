"""Recall@k harness for the approximate ANN read paths vs exact brute
force (verdict-r5 item 6).

Measures, at the REGISTERED parameters (ann3/ann5/ann8/ann9: k=10,
n_bits=8, 16 coarse cells, nprobe=2, PQ m=4 over dim 64), what share
of each query's true top-10 the approximate index returns. The
existing property tests prove exactness at full probe / on codewords;
this measures the accuracy/probe trade at the shipped settings.

Usage: python tools/ann_recall.py [sf_dir ...]
Prints one markdown table per sf_dir (pasted into SCALE.md).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from aistore_spark.operators import simsearch
from aistore_spark.session import get_spark
from aistore_spark.sources.tables import load_table


def _centroid_frame(long_df):
    """kmeans_train's long output (centroid_id, dim, mean_q, n_vecs)
    back to (vec_id, embedding array<float>) for ivf_topk — mean_q is
    on the 1e4 fixed-point grid."""
    return (
        long_df.groupBy("centroid_id")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("dim"), F.col("mean_q")))
                ),
                lambda s: (s["mean_q"].cast("double") / 10000.0).cast("float"),
            ).alias("embedding")
        )
        .select(F.col("centroid_id").alias("vec_id"), "embedding")
    )


def recall_table(
    spark, sf_dir: str, k: int = 10, clustered: bool = False
) -> dict[str, float]:
    """{method: recall@k} for the approximate paths at the registered
    parameters, against brute_force_topk ground truth. With
    ``clustered=True`` the corpus is the deterministic
    mixture-of-Gaussians fixture (functions/ann_fixtures.py) instead of
    the i.i.d. testdata embeddings — the distribution ANN is actually
    used on (verdict-r8 #5) — and the IVF coarse quantizer is
    ADDITIONALLY measured with k-means-trained centroids (ann6b's
    training loop), the honest index-build path on clustered data."""
    if clustered:
        from aistore_spark.functions.ann_fixtures import (
            clustered_embeddings_df,
        )

        emb = clustered_embeddings_df(spark, n=2000).cache()
    else:
        emb = load_table(spark, sf_dir, "embeddings").cache()
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    centroids = emb.filter(F.col("vec_id") < 16)
    truth = (
        simsearch.brute_force_topk(emb, queries, k=k)
        .select("query_id", "neighbor_id")
        .cache()
    )
    n_truth = truth.count()

    approx = {
        "lsh (n_bits=8)": simsearch.lsh_topk(emb, queries, k=k, n_bits=8),
        "ivf (16 cells, nprobe=2)": simsearch.ivf_topk(
            emb, centroids, queries, k=k, nprobe=2
        ),
        "pq-adc (m=4, 16 codes)": simsearch.pq_adc_topk(
            emb, centroids, queries, k=k, m=4, dim=64
        ),
        "ivf-pq (nprobe=2, m=4)": simsearch.ivfpq_topk(
            emb, centroids, centroids, queries, k=k, nprobe=2, m=4, dim=64
        ),
        "lsh multiprobe r=1 (n_bits=8)": simsearch.lsh_topk(
            emb, queries, k=k, n_bits=8, multiprobe=1
        ),
        # quality tier (ann5b/ann9b, verdict-r6 item 3)
        "ivf quality (nprobe=12)": simsearch.ivf_topk(
            emb, centroids, queries, k=k, nprobe=12
        ),
        "ivf-pq refined (nprobe=12, m=8, cb=64, sl=100)": simsearch.ivfpq_refine_topk(
            emb,
            centroids,
            emb.filter(F.col("vec_id") < 64),
            queries,
            k=k,
            nprobe=12,
            m=8,
            dim=64,
            shortlist=100,
        ),
    }
    if clustered:
        trained = _centroid_frame(
            simsearch.kmeans_train(emb, centroids, iters=3)
        ).cache()
        approx["ivf trained-centroids (nprobe=2)"] = simsearch.ivf_topk(
            emb, trained, queries, k=k, nprobe=2
        )
        approx["ivf trained-centroids quality (nprobe=12)"] = (
            simsearch.ivf_topk(emb, trained, queries, k=k, nprobe=12)
        )
    out = {}
    for name, df in approx.items():
        hit = df.select("query_id", "neighbor_id").join(
            truth, ["query_id", "neighbor_id"]
        )
        out[name] = hit.count() / n_truth
    emb.unpersist()
    truth.unpersist()
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--clustered"]
    clustered = "--clustered" in sys.argv[1:]
    spark = get_spark("ann_recall", cpus=8)
    if clustered:
        rt = recall_table(spark, "", clustered=True)
        print(
            "\nclustered mixture-of-Gaussians fixture "
            "(2000 vectors, 16 components, 20 queries, "
            "recall@10 vs brute force):\n"
        )
        print("| method | recall@10 |")
        print("|---|---|")
        for name, r in rt.items():
            print(f"| {name} | {r:.3f} |")
        return 0
    dirs = args or ["/root/testdata/sf0.01"]
    for sf_dir in dirs:
        rt = recall_table(spark, sf_dir)
        n_q = (
            load_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") % 100 == 0)
            .count()
        )
        print(f"\n{sf_dir} ({n_q} queries, recall@10 vs brute force):\n")
        print("| method | recall@10 |")
        print("|---|---|")
        for name, r in rt.items():
            print(f"| {name} | {r:.3f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
