"""Capture .explain("formatted") output for named queries.

Usage: python tools/capture_plans.py OUTDIR SUFFIX [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each named query (default: all
registered queries). The plan is the pre-execution formatted physical
plan (AdaptiveSparkPlan isFinalPlan=false when AQE applies) — the
artifact the optimization-round judge checks plan claims against.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aistore_spark.benchqueries import QUERIES  # noqa: E402
from aistore_spark.session import get_spark  # noqa: E402
from aistore_spark.util import release_cached  # noqa: E402


def main() -> int:
    outdir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:] or sorted(QUERIES)
    outdir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("aistore_spark_plans", cpus=cpus, sf_dir=sf_dir)
    for name in names:
        if name not in QUERIES:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building plan: {type(exc).__name__}: {exc}"
        finally:
            release_cached()
        (outdir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
