"""Every declared [Q] query must match its DuckDB oracle exactly —
the same check the driver runs (row count + columns + value multiset)."""

from __future__ import annotations

import pandas as pd
import pytest

from aistore_spark.benchqueries import ORACLES, QUERIES


def _scalar(v):
    # The driver canonicalizer requires hashable scalar cells; a
    # LIST/ndarray (e.g. DuckDB map['k'] without [1]) crashes it
    # (the r6 s2c incident). Fail loudly here so local-green implies
    # driver-green.
    if isinstance(v, (list, tuple, dict, set, bytearray)) or (
        type(v).__module__ == "numpy" and getattr(v, "ndim", 0) > 0
    ):
        raise TypeError(f"non-scalar cell {type(v).__name__}: {v!r}")
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    return v


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [
        tuple(_scalar(v) for v in tup)
        for tup in df.itertuples(index=False, name=None)
    ]
    rows.sort(key=repr)
    return rows


def test_canon_rejects_non_scalar_cells():
    """The guard itself (r6 s2c incident): a LIST/ndarray cell — what
    DuckDB map['k'] emits without [1] — must raise here and in
    tools/check_oracle.py, never silently compare truthy."""
    import numpy as np

    with pytest.raises(TypeError, match="non-scalar"):
        canon(pd.DataFrame({"a": [np.array(["x"])]}))
    with pytest.raises(TypeError, match="non-scalar"):
        canon(pd.DataFrame({"a": [["x"]]}))
    # scalars (incl. bytes and numpy 0-d scalars) still pass
    assert canon(pd.DataFrame({"a": [b"x"], "b": [np.int64(3)]}))

    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "check_oracle_mod",
        Path(__file__).resolve().parent.parent / "tools" / "check_oracle.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with pytest.raises(TypeError, match="non-scalar"):
        mod.canon(pd.DataFrame({"a": [np.array(["x"])]}))


def test_vectorized_frame_compare_matches_canon_semantics():
    """check_oracle's big-frame fast path (sort_values + equals) must
    be the same exact order-insensitive multiset compare as canon:
    permutations equal, NaN == NaN, any value delta or non-scalar cell
    detected — at sizes where the Python canon would take minutes."""
    import importlib.util
    from pathlib import Path

    import numpy as np

    spec = importlib.util.spec_from_file_location(
        "check_oracle_mod2",
        Path(__file__).resolve().parent.parent / "tools" / "check_oracle.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n = mod._VECTOR_COMPARE_ROWS + 7
    rng = np.random.RandomState(5)
    a = pd.DataFrame(
        {
            "k": rng.randint(0, 1000, n).astype("int64"),
            "s": [f"v{i % 97}" for i in range(n)],
            "f": rng.randn(n),
        }
    )
    a.loc[3, "f"] = float("nan")
    b = a.sample(frac=1.0, random_state=9).reset_index(drop=True)  # permuted
    assert mod.frames_equal(a, b)
    c = b.copy()
    c.loc[0, "k"] = -1
    assert not mod.frames_equal(a, c)
    d = b.copy()
    d["s"] = d["s"].astype(object)
    d["s"].values[5] = ["not", "scalar"]
    with pytest.raises(TypeError, match="non-scalar"):
        mod.frames_equal(a, d)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, oracle, sf_dir):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    odf = oracle.sql(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    a, b = canon(sdf), canon(odf)
    assert a == b
