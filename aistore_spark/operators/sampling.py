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
