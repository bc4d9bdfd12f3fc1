"""Chunked single-pass bench: times a subset of queries at a given
sf_dir and MERGES the per-query walls into an accumulating JSON
artifact (for scales where a full min-of-2 run exceeds one harness
invocation). Usage:
    python tools/bench_chunk.py OUT.json SF_DIR START END
runs the sorted-query-name slice [START:END); when the artifact holds
every registered query it fills in totals + derived throughputs.
"""
from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aistore_spark.benchqueries import QUERIES  # noqa: E402
from aistore_spark.operators.dsort import release_cached  # noqa: E402
from aistore_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path, sf_dir = Path(sys.argv[1]), sys.argv[2]
    start, end = int(sys.argv[3]), int(sys.argv[4])
    names = sorted(QUERIES)[start:end]
    spark = get_spark("aistore_spark_bench_sf1", cpus=32)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    art = json.loads(out_path.read_text()) if out_path.exists() else {
        "metric": "total_declared_query_wall_sec_single_run",
        "unit": "sec",
        "sf": float(re.search(r"sf([0-9.]+)", sf_dir).group(1)),
        "queries": {},
        "errors": {},
    }
    for name in names:
        t0 = time.time()
        try:
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            art["queries"][name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            art["errors"][name] = f"{type(exc).__name__}: {exc}"[:200]
        finally:
            release_cached()
        print(name, art["queries"].get(name), flush=True)

    if set(art["queries"]) | set(art["errors"]) >= set(QUERIES):
        art["value"] = round(sum(art["queries"].values()), 3)
        from aistore_spark.sources.tables import load_table

        q = art["queries"]
        n_requests = load_table(spark, sf_dir, "events").count()
        n_members = load_table(spark, sf_dir, "lineitem").count()
        n_docs = load_table(spark, sf_dir, "documents").count()
        d = {}
        if q.get("g1_assemble_batches"):
            d["get_batch_entries_per_sec"] = round(n_requests / q["g1_assemble_batches"], 1)
        if q.get("j1_get_batch"):
            d["get_batch_plain_objects_per_sec"] = round(n_requests / q["j1_get_batch"], 1)
        if q.get("dsort_pipeline"):
            d["dsort_members_per_sec"] = round(n_members / q["dsort_pipeline"], 1)
        if q.get("p1_pack_archive"):
            d["archive_pack_members_per_sec"] = round(n_members / q["p1_pack_archive"], 1)
        if q.get("s1_list_prefix_page"):
            d["listing_page_sec"] = q["s1_list_prefix_page"]
        if q.get("dd3_lsh_candidates"):
            d["minhash_lsh_docs_per_sec"] = round(n_docs / q["dd3_lsh_candidates"], 1)
        art["derived"] = d
    out_path.write_text(json.dumps(art, indent=1))


if __name__ == "__main__":
    main()
