"""Sampling invariants: splits are complete/disjoint/deterministic,
stratified quotas are exact and stable under physical layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aistore_spark.catalog import objects_catalog
from aistore_spark.operators import sampling
from aistore_spark.sources.tables import load_table


def _objects(spark, sf_dir):
    return objects_catalog(load_table(spark, sf_dir, "documents"))


def test_hash_split_complete_and_stable(spark, sf_dir):
    objects = _objects(spark, sf_dir)
    a = sampling.hash_split(objects, {"train": 98, "val": 1, "test": 1})
    # complete: every row gets a split; proportions in the right regime
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == objects.count()
    assert counts["train"] / total > 0.9
    # deterministic: same membership after a physical reshuffle
    b = sampling.hash_split(objects.repartition(7), {"train": 98, "val": 1, "test": 1})
    assert sorted(map(tuple, a.select("name", "split").collect())) == sorted(
        map(tuple, b.select("name", "split").collect())
    )


def test_hash_split_rejects_bad_weights(spark, sf_dir):
    with pytest.raises(ValueError):
        sampling.hash_split(_objects(spark, sf_dir), {"train": 50, "val": 10})


def test_stratified_sample_exact_quota_and_stable(spark, sf_dir):
    objects = _objects(spark, sf_dir)
    quota = 7
    kept = sampling.stratified_sample(objects, "lang", quota=quota)
    got = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    want = {
        r["lang"]: min(r["n"], quota)
        for r in objects.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == want
    # same rows regardless of input partitioning
    again = sampling.stratified_sample(objects.repartition(5), "lang", quota=quota)
    assert sorted(r["name"] for r in kept.select("name").collect()) == sorted(
        r["name"] for r in again.select("name").collect()
    )


def test_source_mixture_exact_rational_and_determinism(spark):
    """source_mixture realizes num/den epochs exactly: guaranteed
    whole copies for every row, the keyed extra copy for exactly
    (num % den)/den of keys in expectation, zero rows for weight 0,
    and the output is a pure function of the keys (stable across
    repartitions)."""
    from pyspark.sql import functions as F

    from aistore_spark.operators.sampling import source_mixture

    rows = [(f"k{i:05d}", ["a", "b", "c"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "name string, source string")
    weights = {"a": (5, 2), "b": (0, 1)}  # a: 2.5 epochs, b: dropped
    out = source_mixture(df, weights)
    per = {
        (r.name): r.cnt
        for r in out.groupBy("name").agg(F.count("*").alias("cnt")).collect()
    }
    n_a = sum(1 for n, s in rows if s == "a")
    # b rows vanish; c rows (default 1,1) appear exactly once
    assert all(not n.startswith("k") or True for n in per)
    got_sources = {
        r.source for r in out.select("source").distinct().collect()
    }
    assert got_sources == {"a", "c"}
    a_counts = [per[n] for n, s in rows if s == "a"]
    assert set(a_counts) <= {2, 3}
    # exact-rational expectation: extra copy for ~half the keys
    extra = sum(1 for c in a_counts if c == 3)
    assert abs(extra - n_a / 2) < n_a * 0.1
    for n, s in rows:
        if s == "c":
            assert per[n] == 1
    # determinism across layouts
    again = {
        (r.name): r.cnt
        for r in source_mixture(df.repartition(13), weights)
        .groupBy("name")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert per == again


def test_md5_bucket_matches_duckdb_twin(spark, oracle):
    """The shared md5_bucket helper and its documented DuckDB twin
    expression must agree key-for-key — this single contract underpins
    hash_split, source_mixture and mountpath placement."""
    from aistore_spark.util import md5_bucket

    keys = [f"k/{i:05d}.txt" for i in range(500)] + ["￿x", "a,b", ""]
    df = spark.createDataFrame([(k,) for k in keys], "name string")
    got = {
        r.name: r.b
        for r in df.select("name", md5_bucket("name", 97).alias("b")).collect()
    }
    vals = ", ".join("('" + k.replace("'", "''") + "')" for k in keys)
    want = {
        name: b
        for name, b in oracle.sql(
            "SELECT name, ('0x' || substr(md5(name), 1, 8))::BIGINT % 97 AS b "
            f"FROM (VALUES {vals}) t(name)"
        ).fetchall()
    }
    assert got == want


def test_temperature_mixture_python_replay(spark, sf_dir):
    import hashlib
    import math

    from aistore_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    out = sampling.temperature_mixture(docs, scale=4).collect()
    rows = docs.collect()
    counts = {}
    for r in rows:
        counts[r.source] = counts.get(r.source, 0) + 1
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(r)
    for r in rows:
        n = counts[r.source]
        s = math.isqrt(n)
        num, den = 4 * s, n
        bucket = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) % den
        copies = num // den + (1 if bucket < num % den else 0)
        have = got.get(r.doc_id, [])
        assert len(have) == copies, (r.doc_id, copies, len(have))
        if have:
            assert sorted(h.copy_idx for h in have) == list(range(copies))
            assert have[0].sqrt_n == s and have[0].n_source == n


def test_isqrt_exact_matches_math(spark):
    import math

    from aistore_spark.operators.sampling import _isqrt_exact
    from pyspark.sql import functions as F

    ns = list(range(0, 200)) + [10**6 - 1, 10**6, 10**6 + 1, 10**12, 10**12 + 10**6]
    df = spark.createDataFrame([(n,) for n in ns], "n long")
    out = df.select("n", _isqrt_exact(F.col("n")).alias("s")).collect()
    for r in out:
        assert r.s == math.isqrt(r.n), (r.n, r.s)


def test_sliding_windows_coverage_and_replay(spark, sf_dir):
    from aistore_spark.sources.tables import load_table

    W, S = 32, 24
    docs = load_table(spark, sf_dir, "documents")
    dls = {
        r.doc_id: len(r.text.split(" ")) for r in docs.collect()
    }
    out = {}
    for r in sampling.sliding_windows(docs, window=W, stride=S).collect():
        out.setdefault(r.doc_id, []).append(r)
    for doc_id, dl in dls.items():
        wins = sorted(out[doc_id], key=lambda r: r.win_idx)
        if dl <= W:
            assert len(wins) == 1
            assert (wins[0].start, wins[0].end, wins[0].win_len) == (1, dl, dl)
            continue
        n = -(-(dl - W) // S) + 1
        assert len(wins) == n
        covered = set()
        for i, w in enumerate(wins):
            assert w.win_idx == i
            assert w.win_len == W  # long docs: every window full
            assert w.end == w.start + W - 1 <= dl
            if i < n - 1:
                assert w.start == i * S + 1
            else:
                assert w.start == dl - W + 1
            covered.update(range(w.start, w.end + 1))
        assert covered == set(range(1, dl + 1))  # total coverage
