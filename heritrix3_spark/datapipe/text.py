"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are built-in Column expressions (JVM, codegen); only the
document fingerprint uses a (vectorized, Arrow-batched) pandas UDF because
it reuses the engine's exact Rabin hash.

Operators: token counting (whitespace + BPE-ish regex), quality scoring
(length/punct/stopword ratios), language ID (stopword n-gram heuristic),
document fingerprinting (Rabin over normalized text).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from heritrix3_spark.fp import std64

# small deterministic stopword inventories (top function words)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "une", "dans", "que"],
    "es": ["el", "la", "que", "los", "una", "por", "con", "para", "las", "es"],
}


def words_col(text: Column) -> Column:
    """Lower-cased whitespace tokens (empty array for blank text)."""
    trimmed = F.trim(F.lower(text))
    return F.when(F.length(trimmed) > 0, F.split(trimmed, r"\s+")).otherwise(
        F.array().cast("array<string>")
    )


def token_count_col(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words_col(text))


def bpe_ish_token_count_col(text: Column) -> Column:
    """BPE-ish token estimate: word-piece + punctuation regex count."""
    return F.regexp_count(text, F.lit(r"\w+|[^\w\s]"))


def punct_ratio_col(text: Column) -> Column:
    n = F.length(text)
    punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def stopword_ratio_col(text: Column, lang: str = "en") -> Column:
    words = words_col(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return F.when(F.size(words) > 0, hits / F.size(words)).otherwise(F.lit(0.0))


def mean_word_length_col(text: Column) -> Column:
    words = words_col(text)
    total = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(F.size(words) > 0, total / F.size(words)).otherwise(F.lit(0.0))


def quality_score_col(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + sane punctuation +
    English-ish stopword density + sane mean word length. Each component is
    a pure Column, so the score compiles to one codegen stage.
    """
    n_tokens = token_count_col(text)
    len_ok = F.when((n_tokens >= 10) & (n_tokens <= 100_000), 0.25).otherwise(0.0)
    punct = punct_ratio_col(text)
    punct_ok = F.when((punct > 0.001) & (punct < 0.3), 0.25).otherwise(0.0)
    sw = stopword_ratio_col(text)
    sw_ok = F.when(sw > 0.03, 0.25).otherwise(0.0)
    mwl = mean_word_length_col(text)
    mwl_ok = F.when((mwl >= 3.0) & (mwl <= 12.0), 0.25).otherwise(0.0)
    return (len_ok + punct_ok + sw_ok + mwl_ok).cast("double")


def lang_id_col(text: Column) -> Column:
    """Stopword-vote language ID over {en,de,fr,es}, 'und' when no votes.

    A classic n-gram/function-word heuristic expressed as pure columns:
    per-language hit counts -> argmax via greatest+case.
    """
    words = words_col(text)
    scores = {}
    for lang, sws in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in sws])
        scores[lang] = F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # reversed so earlier languages win ties (deterministic)
    for lang in reversed(list(scores)):
        out = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


@pandas_udf(LongType())
def doc_fingerprint_udf(text: pd.Series) -> pd.Series:
    """64-bit Rabin fingerprint of whitespace-normalized lower-cased text —
    the rolling-hash document fingerprint (exact-dup key at corpus scale).
    """
    normalized = (
        text.fillna("").str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
    )
    vals = std64.fp_batch(normalized.tolist()).astype("int64")
    return pd.Series(vals)
