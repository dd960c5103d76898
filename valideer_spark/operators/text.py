"""Text-analysis operators for training-data pipelines — all pure Spark
SQL expressions (JVM, codegen), no Python on any path.

* :func:`token_count` — whitespace tokens + a BPE-ish subword estimate
  (word-count + punctuation + long-word splits).
* :func:`text_stats` — integer character-class counts (hash-stable).
* :func:`quality_score` — length/punctuation/stopword heuristics → [0,1].
* :func:`language_guess` — stopword-hit n-gram heuristic over a small
  per-language lexicon + CJK codepoint ratio.
* :func:`doc_fingerprint` — 64-bit content hash + winnowing-style
  k-gram min-hash fingerprint for shift-robust matching.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text

STOPWORDS: Dict[str, Sequence[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "pour", "que", "dans"],
}


def tokens(col: Column) -> Column:
    return F.split(normalized_text(col), " ")


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_subwords): whitespace tokens plus a BPE-ish
    subword estimate (≈ tokens + punct marks + ⌈len/6⌉ splits of long words)."""
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^\.,;:!?]", ""))
    long_splits = F.aggregate(
        toks,
        F.lit(0),
        lambda acc, t: acc + F.when(F.length(t) > 6, F.floor(F.length(t) / 6)).otherwise(F.lit(0)).cast("int"),
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        (n_tokens + n_punct + long_splits).alias("n_subwords"),
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Integer character-class counts (value-hash-stable: no floats)."""
    t = F.col(text_col)

    def count_class(pattern: str) -> Column:
        return F.length(F.regexp_replace(t, pattern, ""))

    n = F.length(t)
    return df.select(
        F.col(id_col),
        n.alias("n_chars"),
        (n - count_class(r"[a-zA-Z]")).alias("n_alpha"),
        (n - count_class(r"[0-9]")).alias("n_digit"),
        (n - count_class(r"\s")).alias("n_space"),
        (n - count_class(r"[\.,;:!?'\"()\[\]{}-]")).alias("n_punct"),
        F.size(tokens(t)).alias("n_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic [0,1] quality: length band, alpha ratio, stopword hit
    rate, mean word length band — the standard cheap pre-filters."""
    t = F.col(text_col)
    toks = tokens(t)
    n = F.length(t).cast("double")
    n_alpha = (F.length(t) - F.length(F.regexp_replace(t, r"[a-zA-Z ]", ""))).cast("double")
    alpha_ratio = F.when(n > 0, n_alpha / n).otherwise(F.lit(0.0))
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*all_stop)))
    stop_ratio = F.when(F.size(toks) > 0, stop_hits / F.size(toks)).otherwise(F.lit(0.0))
    mean_wordlen = F.when(
        F.size(toks) > 0,
        F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)) / F.size(toks),
    ).otherwise(F.lit(0.0))
    len_band = F.when((n >= 50) & (n <= 20000), 1.0).otherwise(0.3)
    word_band = F.when((mean_wordlen >= 3) & (mean_wordlen <= 12), 1.0).otherwise(0.4)
    score = (
        0.35 * len_band
        + 0.25 * F.least(alpha_ratio * 1.25, F.lit(1.0))
        + 0.2 * F.least(stop_ratio * 5.0, F.lit(1.0))
        + 0.2 * word_band
    )
    return df.select(F.col(id_col), F.round(score, 4).alias("quality"))


def language_guess(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language heuristic with a CJK codepoint shortcut."""
    t = F.col(text_col)
    toks = tokens(t)
    n_cjk = F.length(F.regexp_replace(t, r"[^一-鿿]", ""))
    def stopword_hits(ws):
        words = list(ws)
        return F.size(F.filter(toks, lambda x: x.isin(*words)))

    hit_cols = {lang: stopword_hits(ws) for lang, ws in STOPWORDS.items()}
    best = F.lit("unknown")
    best_hits = F.lit(0)
    for lang, hits in hit_cols.items():
        improved = hits > best_hits
        best = F.when(improved, F.lit(lang)).otherwise(best)
        best_hits = F.when(improved, hits).otherwise(best_hits)
    lang = F.when(n_cjk * 2 >= F.length(t), F.lit("zh")).otherwise(best)
    return df.select(F.col(id_col), lang.alias("lang_guess"))


def doc_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """(doc_id, content_hash, min_kgram_hash): exact 64-bit content hash +
    the minimum k-gram hash (winnowing-style, shift/prefix robust).

    k-gram hashes use the string-free hash-combine staging
    (dedup._gram_hashes); the min over the positional grams equals the
    min over the distinct set, so no dedup pass is needed."""
    from .dedup import _gram_hashes, _token_hashes

    t = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        F.xxhash64(normalized_text(t)).alias("content_hash"),
        _token_hashes(text_col).alias("_th"),
    )
    return staged.select(
        id_col,
        "content_hash",
        F.array_min(_gram_hashes(F.col("_th"), k)).alias("min_kgram_hash"),
    )
