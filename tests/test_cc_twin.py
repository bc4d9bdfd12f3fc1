"""Validate tools/cc_twin.py — the independent large-SF twin that
closes the dd7/pipe3 sf1 skips — by three-way agreement at small SF,
where the registered recursive-SQL closure is still cheap:

    recursive SQL oracle == Python BFS twin == Spark

If the twin agrees with the registered oracle wherever that oracle is
feasible, twin-green at sf1 carries the same evidential weight as
gate-green (same frames_equal strictness, independent closure
algorithm)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from cc_twin import expected_frames, python_cc  # noqa: E402
from check_oracle import frames_equal  # noqa: E402

from aistore_spark.benchqueries import (  # noqa: E402
    _DUP_PAIRS_CTES,
    QUERIES,
    ORACLES,
)


def _pairs(oracle):
    return oracle.sql(
        _DUP_PAIRS_CTES + "SELECT doc_a, doc_b FROM pairs"
    ).df()


def test_twin_matches_recursive_sql_oracle(oracle):
    exp_dd7, exp_pipe3 = expected_frames(_pairs(oracle))
    sql_dd7 = oracle.sql(ORACLES["dd7_dup_groups"]).df()
    sql_pipe3 = oracle.sql(ORACLES["pipe3_dedup_report"]).df()
    assert len(exp_dd7) > 0
    assert frames_equal(sql_dd7, exp_dd7)
    assert frames_equal(sql_pipe3, exp_pipe3)


def test_twin_matches_spark(spark, sf_dir, oracle):
    exp_dd7, exp_pipe3 = expected_frames(_pairs(oracle))
    sdf = QUERIES["dd7_dup_groups"](spark, sf_dir).toPandas()
    assert frames_equal(sdf, exp_dd7)
    pdf = QUERIES["pipe3_dedup_report"](spark, sf_dir).toPandas()
    assert frames_equal(pdf, exp_pipe3)


def test_python_cc_transitive_chain():
    # a-b, b-c, c-d collapse to one group labeled min; isolated pair
    # keeps its own min label
    import pandas as pd

    pairs = pd.DataFrame(
        {"doc_a": [5, 3, 4, 10], "doc_b": [3, 4, 2, 11]}
    )
    label = python_cc(pairs)
    assert {label[5], label[3], label[4], label[2]} == {2}
    assert label[10] == label[11] == 10
