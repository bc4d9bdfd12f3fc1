"""Text analysis for training-data pipelines (beyond-reference,
SURVEY.md §7.8): token counting, quality scoring, language-ID
heuristic, document fingerprinting. All JVM-side column expressions —
no Python in the hot path — so they run at scan speed on 100 TB.

Determinism: ratios are ``round(int/int, 6)``; hashes are md5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aistore_spark.util import spread

#: tiny per-language marker-word lists for the n-gram/stopword
#: language-ID heuristic (argmax of marker hits; ties resolve in this
#: tuple order).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "que", "es"),
    "fr": ("le", "la", "de", "et", "est"),
    "zh": ("de", "shi", "le", "zai", "he"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")


def token_stats(documents: DataFrame) -> DataFrame:
    """Whitespace token counts + distinct-token counts + char stats."""
    words = F.split(F.col("text"), " ")
    return documents.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(words)).cast("bigint").alias("n_uniq_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic quality signals: token count, stopword ratio,
    mean token length, repetition ratio (1 - uniq/total). Exact
    integer counts; ratios rounded to 6 places."""
    words = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(words).cast("bigint")
    n_uniq = F.size(F.array_distinct(words)).cast("bigint")
    n_stop = F.size(
        F.filter(words, lambda w: F.array_contains(stop_arr, w))
    ).cast("bigint")
    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        F.round(n_stop.cast("double") / n_tokens, 6).alias("stop_ratio"),
        F.round(
            (F.length("text") - n_tokens + 1).cast("double") / n_tokens, 6
        ).alias("mean_token_len"),
        F.round(F.lit(1.0) - n_uniq.cast("double") / n_tokens, 6).alias(
            "repetition"
        ),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-word language-ID heuristic: count hits per language's
    marker list; predict the argmax (ties resolve in LANG_MARKERS
    order). Returns hits per language + prediction + agreement with
    the labeled ``lang`` column."""
    words = F.split(F.col("text"), " ")
    hit_cols = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        hit_cols.append(
            F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
            .cast("bigint")
            .alias(f"hits_{lang}")
        )
    df = documents.select("doc_id", F.col("lang").alias("label"), *hit_cols)
    pred = None
    best = None
    for lang in LANG_MARKERS:
        c = F.col(f"hits_{lang}")
        if pred is None:
            pred, best = F.lit(lang), c
        else:
            pred = F.when(c > best, F.lit(lang)).otherwise(pred)
            best = F.when(c > best, c).otherwise(best)
    return df.select(
        "doc_id",
        "label",
        *[F.col(f"hits_{lang}") for lang in LANG_MARKERS],
        pred.alias("pred_lang"),
        (pred == F.col("label")).alias("agree"),
    )


def fingerprint(documents: DataFrame, n: int = 3) -> DataFrame:
    """Document fingerprints: full-content md5 (exact dedup key) and a
    1-permutation MinHash over word n-gram shingles (robust to small
    edits — the rolling-hash winnowing shape)."""
    documents = spread(documents)
    words = F.split(F.col("text"), " ")
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return documents.select(
        "doc_id",
        F.md5(F.lower(F.col("text"))).alias("content_md5"),
        F.array_min(F.transform(grams, F.md5)).alias("shingle_minhash"),
    )
