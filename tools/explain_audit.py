"""Plan-quality audit: prints the formatted physical plan of selected
queries and flags common scale smells:

- parquet scans reading more columns than needed (ReadSchema width)
- missing PushedFilters where a filter exists
- SortMergeJoin where one side is tiny (should broadcast)
- single-partition Exchange or global Sort without range partitioning
- row-at-a-time Python UDFs (BatchEvalPython) — everything should be
  ArrowEvalPython / FlatMapGroupsInPandas

Usage: python tools/explain_audit.py [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aistore_spark.benchqueries import QUERIES
from aistore_spark.session import get_spark

SMELLS = (
    (r"BatchEvalPython", "row-at-a-time Python UDF (use Pandas UDF)"),
    (r"Exchange SinglePartition", "single-partition exchange"),
    (r"CartesianProduct", "cartesian product"),
)


def main() -> int:
    names = sys.argv[1:] or [
        "s1_list_prefix_page",
        "a1_bucket_summary",
        "j1_get_batch",
        "j2_ekm_route",
        "dsort_pipeline",
        "dd3_lsh_candidates",
        "ann1_brute_topk",
        "g1_assemble_batches",
    ]
    spark = get_spark("explain_audit", cpus=8)
    flagged = 0
    for name in names:
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        print(f"\n===== {name} =====")
        print(plan)
        for pat, msg in SMELLS:
            if re.search(pat, plan):
                print(f"  SMELL: {msg}")
                flagged += 1
    print(f"\n{flagged} smells flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
