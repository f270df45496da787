"""Text-analysis operators for training-data pipelines.

All JVM-side Column expressions (no Python UDFs): language-ID
(stopword-hit heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + BPE-ish regex),
document fingerprinting, and word-shingle extraction shared by the
dedup family. Designed over a `documents(doc_id, text, ...)` table but
parameterized by column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"]

# Portable across Java regex and RE2-likes: letters | digits | single
# non-alnum non-space (a BPE-ish pre-tokenizer).
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def normalize_text(c: Column | str) -> Column:
    """Lowercase, collapse whitespace, trim — canonical form used by
    fingerprinting and dedup."""
    col = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def words(c: Column | str) -> Column:
    return F.split(normalize_text(c), " ")


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct n-word shingles per doc: (id, shingle). The base of the
    Jaccard / MinHash dedup family. ``transform`` + ``slice`` keeps the
    shingling JVM-side; explode fans out.

    The words array is materialized as its OWN projection first: an
    expression referenced inside a higher-order-function lambda is
    re-evaluated per array element, so inlining ``words(text)`` (regex
    normalize + split) into the ``transform`` body multiplies the
    normalization cost by the word count — measured 10× slower on the
    documents table. Catalyst keeps the boundary (no project collapse
    into lambda bodies), so the regex runs once per doc."""
    base = df.select(F.col(id_col), words(text_col).alias("_w"))
    k = F.greatest(F.size("_w") - (n - 1), F.lit(0))
    shingles = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.array_join(F.slice("_w", i, n), " "),
    )
    return (
        base.select(F.col(id_col), F.explode(shingles).alias("shingle"))
        .where(F.length("shingle") > 0)
        .distinct()
    )


def token_count_whitespace(c: Column | str) -> Column:
    return F.size(F.split(normalize_text(c), " "))


def token_count_bpe_ish(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), F.lit(0)))


def punct_ratio(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    n_punct = F.length(F.regexp_replace(col, r"[^.!?,;:]", ""))
    return F.round(n_punct / F.greatest(F.length(col), F.lit(1)), 6)


def stopword_ratio(c: Column | str, stopwords: list[str] | None = None) -> Column:
    w = words(c)
    sw = F.array(*[F.lit(s) for s in (stopwords or EN_STOPWORDS)])
    hits = F.size(F.filter(w, lambda x: F.array_contains(sw, x)))
    return F.round(hits / F.greatest(F.size(w), F.lit(1)), 6)


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length/punct/stopword quality features + a keep/drop flag —
    the shape of a pretraining quality filter."""
    t = F.col(text_col)
    n_words = token_count_whitespace(t)
    avg_wl = F.round(
        F.length(F.regexp_replace(normalize_text(t), " ", "")) / F.greatest(n_words, F.lit(1)), 6
    )
    out = df.select(
        F.col(id_col),
        F.length(t).alias("n_chars_m"),
        n_words.alias("n_words"),
        avg_wl.alias("avg_word_len"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
    )
    keep = (
        (F.col("n_words") >= 5)
        & (F.col("avg_word_len") >= 2)
        & (F.col("avg_word_len") <= 12)
        & (F.col("punct_ratio") <= 0.2)
    )
    return out.withColumn("keep", keep)


def language_id(df: DataFrame, id_col: str, text_col: str, threshold: float = 0.05) -> DataFrame:
    """Stopword-hit heuristic language ID: 'en' when the English
    stopword ratio clears the threshold, else 'und'."""
    r = stopword_ratio(text_col)
    return df.select(
        F.col(id_col),
        r.alias("en_score"),
        F.when(r >= threshold, F.lit("en")).otherwise(F.lit("und")).alias("lang_pred"),
    )


def text_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The whole text-analysis battery in ONE projection: quality
    features + keep flag, token counts (whitespace + BPE-ish),
    language-ID, and the md5 content fingerprint. One narrow pass — at
    corpus scale this beats running the per-facet operators as separate
    jobs (N scans → 1), and shared subexpressions (normalized text,
    word split) are computed once per row."""
    t = F.col(text_col)
    n_words = token_count_whitespace(t)
    avg_wl = F.round(
        F.length(F.regexp_replace(normalize_text(t), " ", "")) / F.greatest(n_words, F.lit(1)), 6
    )
    pr = punct_ratio(t)
    sr = stopword_ratio(t)
    keep = (n_words >= 5) & (avg_wl >= 2) & (avg_wl <= 12) & (pr <= 0.2)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars_m"),
        n_words.alias("n_words"),
        avg_wl.alias("avg_word_len"),
        pr.alias("punct_ratio"),
        sr.alias("stopword_ratio"),
        keep.alias("keep"),
        n_words.alias("ws_tokens"),
        token_count_bpe_ish(t).alias("bpe_tokens"),
        sr.alias("en_score"),
        F.when(sr >= 0.05, F.lit("en")).otherwise(F.lit("und")).alias("lang_pred"),
        F.md5(normalize_text(t)).alias("fp_md5"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stable content fingerprint of the normalized text (md5 — portable
    across engines) plus a 64-bit rolling-style hash (xxhash64)."""
    norm = normalize_text(text_col)
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp_md5"),
        F.xxhash64(norm).alias("fp64"),
    )
