"""Third-decade (sf100) bench leg for the scale-law rows — verdict-r13
item 4.

Times the five rows whose 100 TB story rests on a scaling LAW (not
just a plan shape) at /root/repo/_scale/sf100 (tools/gen_sf100.py),
with the task-skew probe active, and attaches a per-row CORRECTNESS
INVARIANT — the single-node DuckDB oracle is infeasible at this tier
for the heavy rows, so each row carries the strongest check that IS
feasible:

- ann9d_ivfpq_sqrt_cells: recall@10 against exact brute force on a
  64-query md5-stratified sample of its own query set (the registered
  clustered corpus) — the √N sizing rule must HOLD accuracy while the
  probed mass stays ~nprobe·√N.
- dd6b_simhash_prod: structural conservation — every output pair has
  hamming <= 3 (the registered bound), doc_a < doc_b, no duplicate
  pairs; plus a fingerprint cross-check on a sampled subset of pairs
  (hamming recomputed from dedup.simhash(bits=64) fingerprints must
  match the pair row).
- dd1_exact_dedup / a1_bucket_summary: full DuckDB hash-exact oracle
  at sf100 — their oracles read only the 500k-row documents table, so
  the third decade gets REAL oracle rows (run via check_oracle, see
  tools/run_sf100_oracle_r14.sh); here they just get walls + skew.
- d1_sort_alphanumeric: permutation invariant — row count equals an
  INDEPENDENT DuckDB count(distinct member) over the raw lineitem
  parquet (the member-name derivation re-expressed in SQL), ranks are
  exactly 1..N with no gaps or dups (checked via min/max/distinct).

Writes BENCH_r14_sf100.json: walls, task_skew, invariant verdicts.
Usage: python tools/bench_sf100.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from aistore_spark.benchqueries import QUERIES  # noqa: E402
from aistore_spark.operators.dsort import release_cached  # noqa: E402
from aistore_spark.session import get_spark  # noqa: E402
from aistore_spark.skew import worst_task_skew  # noqa: E402
from bench import record_worst_skew  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF100_DIR", "/root/repo/_scale/sf100")
ANN9D_OUT = "/tmp/sf100_ann9d_out.parquet"
ROWS = [
    "a1_bucket_summary",
    "dd1_exact_dedup",
    "d1_sort_alphanumeric",
    "dd6b_simhash_prod",
    "ann9d_ivfpq_sqrt_cells",
]


def _timed(spark, name, task_skew, persist_to: str | None = None):
    """Wall + skew for one query. ``persist_to`` writes the result to
    parquet instead of the noop sink — used for ann9d so the recall
    invariant reads the SAME run's output rather than paying the
    10-30 min query twice (the 20k-row parquet write is noise against
    the compute)."""
    t0 = time.time()
    df = QUERIES[name](spark, SF_DIR)
    if persist_to:
        df.write.mode("overwrite").parquet(persist_to)
    else:
        df.write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    skew = worst_task_skew(
        spark, int(t0 * 1000), min_max_ms=max(1000.0, wall * 1000.0 * 0.10)
    )
    record_worst_skew(task_skew, name, skew)
    release_cached()
    print(f"[sf100] {name}: {wall:.1f}s", flush=True)
    return round(wall, 3)


def _inv_ann9d(spark) -> dict:
    """Recall@10 vs exact brute on 64 md5-stratified sample queries,
    over the REGISTERED clustered corpus — two tiers:

    - the registered ECONOMY config (√N cells, nprobe=20, 1-iter
      build; read from the timed run's persisted output): its recall
      DECAYS with scale by design — constant nprobe probes a
      nprobe/√N-shrinking cell fraction (measured 0.548/0.438/0.125
      across sf1/sf10/sf100) on this mode-saturated fixture;
    - the RECALL-HELD config (3-iter build, nprobe =
      simsearch.recall_held_nprobe(cells) — the sf10-anchored 4.5%
      cell fraction): this is the tier the pass verdict gates on,
      because it is the documented answer to "what do I turn at the
      next decade" (SCALE.md r14 grid: 0.906 at sf100)."""
    from aistore_spark.benchqueries import _clustered_corpus
    from aistore_spark.operators import simsearch
    from aistore_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    corpus, _ = _clustered_corpus(emb)
    corpus = corpus.localCheckpoint(eager=True)
    n = corpus.count()
    sample_ids = [
        r["vec_id"]
        for r in (
            corpus.filter(F.col("vec_id") % 100 == 0)
            .select("vec_id")
            .orderBy(F.md5(F.col("vec_id").cast("string")))
            .limit(64)
            .collect()  # 64 ids — driver-bounded by construction
        )
    ]
    queries = corpus.filter(F.col("vec_id").isin(sample_ids)).localCheckpoint(
        eager=True
    )
    truth = (
        simsearch.brute_force_topk(corpus, queries, k=10)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    n_truth = truth.count()

    def recall_of(df) -> float:
        return (
            df.select("query_id", "neighbor_id")
            .join(truth, ["query_id", "neighbor_id"])
            .count()
            / n_truth
        )

    economy = recall_of(
        spark.read.parquet(ANN9D_OUT).filter(F.col("query_id").isin(sample_ids))
    )
    k_cells = simsearch.n_coarse_cells(n)
    stride = max(1, n // k_cells)
    seeds = corpus.filter(F.col("vec_id") % stride == 0)
    cents = simsearch.kmeans_centroid_frame(
        simsearch.kmeans_train(corpus, seeds, iters=3)
    ).localCheckpoint(eager=True)
    nprobe = simsearch.recall_held_nprobe(k_cells)
    held = recall_of(
        simsearch.ivfpq_refine_topk(
            corpus, cents, corpus.filter(F.col("vec_id") < 64), queries,
            k=10, nprobe=nprobe, m=8, dim=64, shortlist=None,
        )
    )
    return {
        "check": "recall@10 vs exact brute, 64 md5-stratified queries; "
        "economy (registered: nprobe=20, 1-iter) + recall-held "
        f"(nprobe={nprobe} = 4.5% of {k_cells} cells, 3-iter build)",
        "recall_economy": round(economy, 4),
        "recall_held": round(held, 4),
        "pass": held >= 0.60,
    }


def _inv_dd6b(spark) -> dict:
    from aistore_spark.operators import dedup
    from aistore_spark.sources.tables import load_table

    out = QUERIES["dd6b_simhash_prod"](spark, SF_DIR).localCheckpoint(
        eager=True
    )
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_a", "doc_b").alias("nd"),
        F.max("hamming").alias("maxh"),
        F.sum(F.when(F.col("doc_a") < F.col("doc_b"), 0).otherwise(1)).alias(
            "bad_order"
        ),
    ).collect()[0]
    # fingerprint cross-check on a md5-stratified 1/64 sample of pairs:
    # hamming recomputed from the independent one-pass simhash()
    # fingerprints must equal the pair row's hamming
    docs = load_table(spark, SF_DIR, "documents")
    fp = dedup.simhash(docs, bits=64).localCheckpoint(eager=True)
    n_fp = fp.count()
    n_docs = docs.count()
    sampled = out.filter(
        F.substring(F.md5(F.concat_ws("|", "doc_a", "doc_b")), 1, 2) == "00"
    )
    xor_bits = F.sum(
        F.when(
            F.substring(F.col("fa.simhash"), F.col("j"), 1)
            != F.substring(F.col("fb.simhash"), F.col("j"), 1),
            1,
        ).otherwise(0)
    )
    mism = (
        sampled.join(fp.alias("fa"), F.col("doc_a") == F.col("fa.doc_id"))
        .join(fp.alias("fb"), F.col("doc_b") == F.col("fb.doc_id"))
        .crossJoin(
            spark.range(1, 65).select(F.col("id").cast("int").alias("j"))
        )
        .groupBy("doc_a", "doc_b", "hamming")
        .agg(xor_bits.alias("h2"))
        .filter(F.col("h2") != F.col("hamming"))
        .count()
    )
    n_sampled = sampled.count()
    ok = (
        agg["n"] == agg["nd"]
        and agg["maxh"] <= 3
        and agg["bad_order"] == 0
        and n_fp == n_docs
        and mism == 0
        and n_sampled > 0
    )
    return {
        "check": "pair structure + sampled fingerprint cross-check",
        "n_pairs": agg["n"],
        "max_hamming": agg["maxh"],
        "n_sampled_crosschecked": n_sampled,
        "hamming_mismatches": mism,
        "fingerprints_vs_docs": [n_fp, n_docs],
        "pass": bool(ok),
    }


def _inv_d1(spark) -> dict:
    import duckdb

    out = QUERIES["d1_sort_alphanumeric"](spark, SF_DIR).localCheckpoint(
        eager=True
    )
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rank").alias("rmin"),
        F.max("rank").alias("rmax"),
        F.countDistinct("rank").alias("rdist"),
    ).collect()[0]
    # independent expected count: the member-name derivation
    # re-expressed directly over the raw parquet in DuckDB
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    expected = con.execute(
        f"""
        SELECT count(DISTINCT 'rec-' || lpad(CAST(l_orderkey AS VARCHAR), 8, '0')
               || '.' || CASE l_linenumber % 3 WHEN 0 THEN 'jpg'
                                              WHEN 1 THEN 'cls'
                                              ELSE 'xml' END)
        FROM read_parquet('{SF_DIR}/lineitem.parquet')
        """
    ).fetchone()[0]
    con.close()
    ok = (
        agg["n"] == expected
        and agg["rmin"] == 1
        and agg["rmax"] == expected
        and agg["rdist"] == expected
    )
    return {
        "check": "rank is a 1..N permutation; N == independent DuckDB "
        "count(distinct member) over raw lineitem",
        "n": agg["n"],
        "expected": expected,
        "pass": bool(ok),
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--invariants-only"]
    inv_only = "--invariants-only" in sys.argv[1:]
    out_path = Path(args[0] if args else "BENCH_r14_sf100.json")
    spark = get_spark("aistore_spark_sf100", cpus=32)
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()  # warm FS

    walls: dict[str, float] = {}
    task_skew: dict[str, dict] = {}
    if inv_only:
        # keep the already-measured walls/skew; recompute only the
        # invariant block (requires the timed run's persisted ann9d
        # output at ANN9D_OUT)
        prior = json.loads(out_path.read_text())
        walls = prior["queries"]
        task_skew = prior.get("task_skew", {})
    else:
        for name in ROWS:
            walls[name] = _timed(
                spark,
                name,
                task_skew,
                persist_to=ANN9D_OUT
                if name == "ann9d_ivfpq_sqrt_cells"
                else None,
            )

    invariants = {}
    if inv_only:
        # a prior leg's passing invariants stand (their inputs did not
        # change); only re-run ones that are absent or failed
        invariants.update(
            {
                k: v
                for k, v in prior.get("invariants", {}).items()
                if v.get("pass") is True
            }
        )
    for name, fn in (
        ("d1_sort_alphanumeric", _inv_d1),
        ("dd6b_simhash_prod", _inv_dd6b),
        ("ann9d_ivfpq_sqrt_cells", _inv_ann9d),
    ):
        if name in invariants:
            continue
        t0 = time.time()
        invariants[name] = fn(spark)
        invariants[name]["check_sec"] = round(time.time() - t0, 1)
        print(f"[sf100] invariant {name}: {invariants[name]}", flush=True)
    invariants["dd1_exact_dedup"] = invariants["a1_bucket_summary"] = {
        "check": "full DuckDB oracle at sf100 — see CORRECTNESS_SF100_r14.json"
    }

    art = {
        "metric": "total_declared_query_wall_sec_single_run",
        "value": round(sum(walls.values()), 3),
        "unit": "sec",
        "sf": 100.0,
        "queries": walls,
        "task_skew": task_skew,
        "invariants": invariants,
        "note": "bench-only third-decade tier (tools/gen_sf100.py): "
        "scale-law rows only; d1's axis caps at 6.66x sf10 names "
        "(8-digit member-name bound)",
    }
    out_path.write_text(json.dumps(art, indent=1) + "\n")
    print(json.dumps(art))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
