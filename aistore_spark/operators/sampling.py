"""Deterministic sampling for training-data curation (beyond-reference,
SURVEY.md §7.8 family).

A 100 TB corpus pipeline needs reproducible dataset assembly:

- :func:`hash_split` — train/val/test assignment by content hash, so
  the split is stable across runs, engines, and cluster sizes (never
  ``rand()``, which is neither reproducible nor engine-portable);
- :func:`stratified_sample` — an exact per-stratum quota (e.g. N docs
  per language) in deterministic hash order, WITHOUT a per-stratum
  window: ranking reuses the dsort two-pass range-partitioned
  :func:`~aistore_spark.operators.dsort.global_rank`, so a stratum
  with billions of rows never funnels through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aistore_spark.operators.dsort import global_cumsum, global_rank


def hash_split(
    df: DataFrame,
    weights: dict[str, int],
    key_col: str = "name",
) -> DataFrame:
    """Assign each row to a named split with ``weights`` proportions
    (integer percages summing to 100) by md5-bucketing ``key_col``.

    The bucket is the first 8 hex digits of md5(key) mod 100 — fully
    determined by the key, so membership survives reshuffles, appends
    and engine changes.  Pure column expression: no shuffle at all.
    """
    total = sum(weights.values())
    if total != 100:
        raise ValueError(f"split weights must sum to 100, got {total}")
    from aistore_spark.util import md5_bucket

    bucket = md5_bucket(key_col, 100)
    expr = None
    acc = 0
    for split, w in weights.items():
        acc += w
        cond = bucket < acc
        expr = F.when(cond, split) if expr is None else expr.when(cond, split)
    return df.withColumn("split", expr)


def pack_sequences(
    documents: DataFrame,
    budget: int = 2048,
) -> DataFrame:
    """Concat-and-chunk sequence packing for LLM pretraining: documents
    are laid end-to-end in deterministic ``doc_id`` order and cut into
    fixed ``budget``-token sequences (the standard pretraining packer —
    every sequence is exactly full; a document may straddle a cut).

    Returns per doc: its token count, the sequence it starts in
    (``seq_id``), its offset within that sequence, and how many
    sequences it spans.

    Scale shape: token counting is a JVM column expression; the global
    offset is the dsort two-pass range-partitioned
    :func:`~aistore_spark.operators.dsort.global_cumsum` — no
    single-partition window, so the packer costs one range shuffle at
    any corpus size.
    """
    toks = documents.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    return pack_counts(toks, budget)


def pack_counts(toks: DataFrame, budget: int = 2048) -> DataFrame:
    """The packing core over any precomputed ``(doc_id, n_tokens)``
    table — lets the packer run on REAL tokenizer output (e.g. the
    learned-BPE counts of :func:`~aistore_spark.operators.text.
    bpe_doc_token_counts`) instead of whitespace counts. Same
    two-pass range-partitioned cumsum, no single-partition window."""
    cum = global_cumsum(toks, ["doc_id"], "n_tokens", "cum")
    start = F.col("cum") - F.col("n_tokens")
    seq_id = F.expr(f"(cum - n_tokens) div {budget}")
    return cum.select(
        "doc_id",
        "n_tokens",
        seq_id.alias("seq_id"),
        (start % budget).alias("seq_offset"),
        (F.expr(f"(cum - 1) div {budget}") - seq_id + 1).alias("n_seqs_spanned"),
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    quota: int,
    key_col: str = "name",
) -> DataFrame:
    """Keep at most *quota* rows per ``group_col`` value, chosen in
    deterministic md5(key) order.

    Scale shape: one global two-pass rank over (group, hash, key) —
    range-partitioned, no per-group window task — then the per-group
    offset (its first global rank) comes from a tiny groupBy that
    broadcasts back.  A stratum of any size costs the same as sorting
    its rows across the whole cluster.
    """
    keyed = df.withColumn("_h", F.md5(key_col))
    ranked = global_rank(keyed, [group_col, "_h", key_col], rank_col="_r")
    offsets = ranked.groupBy(group_col).agg(F.min("_r").alias("_off"))
    return (
        ranked.join(F.broadcast(offsets), group_col)
        .filter(F.col("_r") - F.col("_off") < quota)
        .drop("_h", "_r", "_off")
    )


def source_mixture(
    df: DataFrame,
    weights: dict[str, tuple[int, int]],
    default_weight: tuple[int, int] = (1, 1),
    source_col: str = "source",
    key_col: str = "name",
) -> DataFrame:
    """Deterministic source-weighted upsampling — the data-mixing step
    of pretraining assembly ("epochs per source"): each row is
    replicated ``num/den`` times in expectation, exactly and
    reproducibly. *weights* maps source → (num, den) as an exact
    rational (e.g. ``(5, 2)`` = 2.5 epochs); unlisted sources take
    *default_weight*.

    Replication count per row = ``num div den`` guaranteed copies,
    plus one extra copy iff the row's md5 bucket (0..den-1) is below
    ``num mod den`` — so over any key population the realized mix
    converges to the target rational with zero randomness: membership
    of the extra copy is a pure function of the key, stable across
    runs, engines, and cluster sizes.

    Output: one row per COPY, ``(.., copy_idx)`` with ``copy_idx`` in
    ``0..n_copies-1`` — ready to feed the packer; rows with zero
    copies (downsampled sources) drop out.

    Scale shape: pure column math + ``explode(sequence(...))`` —
    map-side only, zero shuffles; the mix report is one
    map-side-combinable rollup.
    """
    num = None
    den = None
    for src, (n_, d_) in weights.items():
        if n_ < 0 or d_ <= 0:
            raise ValueError(f"weight for {src!r} must be (num>=0, den>0)")
        cond = F.col(source_col) == src
        num = F.when(cond, n_) if num is None else num.when(cond, n_)
        den = F.when(cond, d_) if den is None else den.when(cond, d_)
    dn, dd = default_weight
    num = (num.otherwise(dn) if num is not None else F.lit(dn)).cast("bigint")
    den = (den.otherwise(dd) if den is not None else F.lit(dd)).cast("bigint")
    from aistore_spark.util import md5_bucket

    bucket = md5_bucket(key_col, den)
    # whole part exactly (num - num%den is divisible by den; the double
    # division is exact for these magnitudes), plus the keyed extra copy
    whole = ((num - num % den) / den).cast("bigint")
    n_copies = whole + F.when(bucket < num % den, 1).otherwise(0)
    out = df.withColumn("n_copies", n_copies.cast("bigint"))
    return out.filter(F.col("n_copies") > 0).select(
        "*",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("n_copies") - 1)
        ).alias("copy_idx"),
    )


def _isqrt_exact(n):
    """Exact integer sqrt as a column expression: float sqrt, then a
    ±1 integer correction so FP rounding can never change the result —
    engine-portable (the DuckDB twin applies the same correction)."""
    s0 = F.floor(F.sqrt(n.cast("double"))).cast("bigint")
    return (
        F.when((s0 + 1) * (s0 + 1) <= n, s0 + 1)
        .when(s0 * s0 > n, s0 - 1)
        .otherwise(s0)
    )


def temperature_mixture(
    df: DataFrame,
    scale: int = 4,
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based source rebalancing at alpha = 1/2 — the
    multilingual/multi-source sampling standard (sample source s with
    probability proportional to n_s^alpha, flattening the head and
    boosting the tail). Each row of source s gets
    ``scale * isqrt(n_s) / n_s`` copies as an exact rational: whole
    part guaranteed, fractional part keyed on the row's md5 bucket —
    the same zero-randomness replication contract as
    :func:`source_mixture`, but with the weights DERIVED FROM DATA
    (one tiny per-source count aggregate) instead of caller-supplied.

    sqrt stays in the exact integer domain via a ±1-corrected isqrt,
    so both engines agree bit-for-bit at any count magnitude.

    Output: one row per copy ``(source, doc_id, copy_idx, n_source,
    sqrt_n)``. Scale shape: one map-side-combinable count per source,
    a sources-sized broadcast join back, then pure column math +
    ``explode(sequence)`` — no corpus shuffle.
    """
    counts = df.groupBy(source_col).agg(F.count("*").cast("bigint").alias("n_source"))
    counts = counts.select(
        source_col, "n_source", _isqrt_exact(F.col("n_source")).alias("sqrt_n")
    )
    from aistore_spark.util import md5_bucket

    num = F.lit(scale).cast("bigint") * F.col("sqrt_n")
    den = F.col("n_source")
    bucket = md5_bucket(F.col(key_col).cast("string"), den)
    whole = F.expr(f"({scale} * sqrt_n) div n_source").cast("bigint")
    n_copies = whole + F.when(bucket < num % den, 1).otherwise(0)
    out = (
        df.join(F.broadcast(counts), source_col)
        .withColumn("n_copies", n_copies.cast("bigint"))
        .filter(F.col("n_copies") > 0)
    )
    return out.select(
        source_col,
        key_col,
        "n_source",
        "sqrt_n",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("n_copies") - 1)
        ).alias("copy_idx"),
    )


def sliding_windows(
    df: DataFrame,
    window: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping context-window chunking — the "split long documents
    into model-context-sized pieces with overlap" step of training-data
    prep. Windows are ``window`` tokens wide starting every ``stride``
    tokens; the LAST window is clamped to end exactly at the document
    end (so every token is covered and every window except a short
    doc's single window is full) — the standard tokenizer-chunking
    contract.

    For dl <= window: one window [1, dl]. Else n_windows =
    ceil((dl - window) / stride) + 1, start_i = 1 + i*stride for
    i < n-1, last start = dl - window + 1.

    Output: one row per window ``(doc_id, win_idx, start, end,
    win_len)``, exact integers. Scale: pure column math +
    ``explode(sequence)`` over the corpus scan — zero shuffles,
    zero joins.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    dl = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    n_win = F.when(dl <= window, F.lit(1).cast("bigint")).otherwise(
        F.expr(f"(size(split({text_col}, ' ')) - {window} + {stride} - 1) "
               f"div {stride}").cast("bigint") + 1
    )
    base = df.select(
        id_col, dl.alias("dl"), n_win.alias("n_win")
    )
    win = base.select(
        id_col,
        "dl",
        "n_win",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("n_win") - 1)
        ).alias("win_idx"),
    )
    start = (
        F.when(F.col("dl") <= window, F.lit(1).cast("bigint"))
        .when(
            F.col("win_idx") == F.col("n_win") - 1,
            F.col("dl") - window + 1,
        )
        .otherwise(F.col("win_idx") * stride + 1)
    )
    return win.select(
        id_col,
        F.col("win_idx"),
        start.alias("start"),
        F.least(start + window - 1, F.col("dl")).alias("end"),
        (F.least(start + window - 1, F.col("dl")) - start + 1).alias("win_len"),
    )
