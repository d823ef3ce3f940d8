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
    sw = STOPWORDS[lang]

    # bind the words array ONCE through a transform-lambda: Catalyst
    # otherwise duplicates the split(trim(lower(text))) subtree into every
    # reference (3x here — see canonicalize.py for the same pattern), and
    # `isin` compiles to a hash-set probe instead of an O(|sw|) array scan
    def _ratio(ws: Column) -> Column:
        hits = F.size(F.filter(ws, lambda w: w.isin(*sw)))
        return F.when(F.size(ws) > 0, hits / F.size(ws)).otherwise(F.lit(0.0))

    return F.transform(F.array(words_col(text)), _ratio)[0]


def mean_word_length_col(text: Column) -> Column:
    words = words_col(text)
    total = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(F.size(words) > 0, total / F.size(words)).otherwise(F.lit(0.0))


def quality_score_col(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + sane punctuation +
    English-ish stopword density + sane mean word length. Each component is
    a pure Column, so the score compiles to one codegen stage.

    The words array, the punctuation count and the text length are bound
    once through a transform-lambda (Catalyst would otherwise expand the
    split subtree ~10x across the CASE branches), and the stopword-hit and
    word-length sums fuse into ONE aggregate pass over the bound array
    (previously: a filter pass plus two aggregate passes).
    """
    sw = STOPWORDS["en"]
    bound = F.struct(
        words_col(text).alias("ws"),
        F.regexp_count(text, F.lit(r"[^\w\s]")).alias("pn"),
        F.length(text).alias("len"),
    )

    def _score(b: Column) -> Column:
        ws, pn, ln = b["ws"], b["pn"], b["len"]
        stats = F.aggregate(
            ws,
            F.struct(F.lit(0).alias("hits"), F.lit(0).alias("total")),
            lambda acc, w: F.struct(
                (acc["hits"] + F.when(w.isin(*sw), 1).otherwise(0)).alias("hits"),
                (acc["total"] + F.length(w)).alias("total"),
            ),
        )

        def _fin(st: Column) -> Column:
            n = F.size(ws)
            len_ok = F.when((n >= 10) & (n <= 100_000), 0.25).otherwise(0.0)
            punct = F.when(ln > 0, pn / ln).otherwise(F.lit(0.0))
            punct_ok = F.when((punct > 0.001) & (punct < 0.3), 0.25).otherwise(0.0)
            swr = F.when(n > 0, st["hits"] / n).otherwise(F.lit(0.0))
            sw_ok = F.when(swr > 0.03, 0.25).otherwise(0.0)
            mwl = F.when(n > 0, st["total"] / n).otherwise(F.lit(0.0))
            mwl_ok = F.when((mwl >= 3.0) & (mwl <= 12.0), 0.25).otherwise(0.0)
            return len_ok + punct_ok + sw_ok + mwl_ok

        return F.transform(F.array(stats), _fin)[0]

    return F.transform(F.array(bound), _score)[0].cast("double")


def lang_id_col(text: Column) -> Column:
    """Stopword-vote language ID over {en,de,fr,es}, 'und' when no votes.

    A classic n-gram/function-word heuristic expressed as pure columns:
    per-language hit counts -> argmax via greatest+case.
    """
    langs = list(STOPWORDS)
    # ONE aggregate pass over the words array computes all four language
    # vote counts at once (was: four filter passes, each re-expanding the
    # split subtree); the vote struct is bound through a transform-lambda
    # so the argmax CASE chain references it without re-evaluating it.
    votes = F.aggregate(
        words_col(text),
        F.struct(*[F.lit(0).alias(lang) for lang in langs]),
        lambda acc, w: F.struct(
            *[
                (
                    acc[lang] + F.when(w.isin(*STOPWORDS[lang]), 1).otherwise(0)
                ).alias(lang)
                for lang in langs
            ]
        ),
    )

    def _argmax(v: Column) -> Column:
        best = F.greatest(*[v[lang] for lang in langs])
        out = F.lit("und")
        # reversed so earlier languages win ties (deterministic)
        for lang in reversed(langs):
            out = F.when((best > 0) & (v[lang] == best), F.lit(lang)).otherwise(out)
        return out

    return F.transform(F.array(votes), _argmax)[0]


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


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style repetition removal, Rae et al. 2021 §A1.1:
# documents dominated by repeated lines / n-grams are low-quality training
# data). All per-row laws are pure higher-order-function Columns (JVM,
# codegen, no shuffle); the top-bigram law is one doc_id-keyed aggregation.
# ---------------------------------------------------------------------------

def lines_col(text: Column) -> Column:
    """Non-empty trimmed lines of a document."""
    return F.filter(
        F.transform(F.split(F.coalesce(text, F.lit("")), "\n"), F.trim),
        lambda x: F.length(x) > 0,
    )


def _safe_frac(num: Column, den: Column) -> Column:
    return F.round(
        F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(0.0), 6
    )


def _bind(value: Column, fn) -> Column:
    """Evaluate ``value`` ONCE and pass the result to ``fn`` (the
    transform-over-1-element-array binding from canonicalize.py).

    Catalyst duplicates expression subtrees referenced more than once —
    and re-evaluates subtrees *captured inside HOF lambdas* per array
    element — so every multi-use of an expensive array expression below
    goes through this."""
    return F.transform(F.array(value), fn)[0]


def dup_line_fraction_col(text: Column) -> Column:
    """Fraction of lines that are repeats of another line:
    1 - distinct_lines/lines (0 for empty docs)."""
    return _bind(
        lines_col(text),
        lambda lines: _safe_frac(
            F.size(lines) - F.size(F.array_distinct(lines)), F.size(lines)
        ),
    )


def dup_line_char_fraction_col(text: Column) -> Column:
    """Character-weighted duplicate-line fraction: 1 - chars(distinct
    lines)/chars(all lines) — the dedup-savings form of Gopher's
    duplicate-line character fraction."""
    chars = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return _bind(
        lines_col(text),
        lambda lines: _bind(
            chars(lines),
            lambda total: _safe_frac(
                total - chars(F.array_distinct(lines)), total
            ),
        ),
    )


def dup_word_fraction_col(text: Column) -> Column:
    """Fraction of word occurrences that repeat an earlier word."""
    return _bind(
        words_col(text),
        lambda w: _safe_frac(
            F.size(w) - F.size(F.array_distinct(w)), F.size(w)
        ),
    )


def _ngrams_of(w: Column, n: int) -> Column:
    """n-grams over an ALREADY-BOUND words array (lambda var or attr)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + k).cast("int")) for k in range(n)]
        ),
    )
    return F.when(F.size(w) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams_col(text: Column, n: int) -> Column:
    """Word n-grams (space-joined) as an array column, [] when < n words.

    The < n guard matters: Spark's ``sequence(1, stop)`` DESCENDS when
    stop < 1 instead of returning an empty array. The words array is bound
    before the transform — captured free subtrees inside HOF lambdas are
    re-evaluated PER ELEMENT, which made this O(words^2) splits per doc."""
    return _bind(words_col(text), lambda w: _ngrams_of(w, n))


def dup_ngram_fraction_col(text: Column, n: int = 5) -> Column:
    """Fraction of word n-grams that repeat an earlier n-gram (Gopher's
    duplicate-n-gram family, count form)."""
    return _bind(
        word_ngrams_col(text, n),
        lambda g: _safe_frac(
            F.size(g) - F.size(F.array_distinct(g)), F.size(g)
        ),
    )


def top_bigram_char_fraction(
    docs, id_col: str = "doc_id", text_col: str = "text"
):
    """Per-document fraction of word characters covered by the single most
    frequent word bigram (Gopher's top-n-gram character fraction, n=2):
    count(top bigram) * chars(top bigram without the space) / total word
    chars. Ties break to the lexically-smallest bigram.

    Scale shape: one explode + one (doc_id, bigram) hash aggregate + one
    doc_id-partitioned window — everything keyed by doc_id, so the plan
    partitions by document and survives any corpus size.
    """
    from pyspark.sql import Window

    w = words_col(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        word_ngrams_col(F.col(text_col), 2).alias("__bgs"),
        F.aggregate(
            w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("__word_chars"),
    )
    counts = (
        base.select(id_col, "__word_chars", F.explode("__bgs").alias("__bg"))
        .groupBy(id_col, "__word_chars", "__bg")
        .agg(F.count("*").alias("__n"))
    )
    rk = Window.partitionBy(id_col).orderBy(F.col("__n").desc(), F.col("__bg"))
    top = (
        counts.withColumn("__rk", F.row_number().over(rk))
        .filter(F.col("__rk") == 1)
        .select(
            id_col,
            F.col("__bg").alias("top_2gram"),
            F.col("__n").alias("top_2gram_count"),
            _safe_frac(
                F.col("__n") * (F.length("__bg") - 1), F.col("__word_chars")
            ).alias("top_2gram_char_fraction"),
        )
    )
    # docs with < 2 words have no bigram: fraction 0, NULL bigram
    return (
        docs.select(id_col).join(top, id_col, "left").select(
            id_col,
            "top_2gram",
            F.coalesce("top_2gram_count", F.lit(0)).alias("top_2gram_count"),
            F.coalesce("top_2gram_char_fraction", F.lit(0.0)).alias(
                "top_2gram_char_fraction"
            ),
        )
    )


def repetition_signals(docs, id_col: str = "doc_id", text_col: str = "text"):
    """All repetition signals per document: duplicate lines (count + char
    weighted), duplicate words, duplicate 5-grams, and the top-bigram
    character fraction."""
    t = F.col(text_col)
    per_row = docs.select(
        F.col(id_col),
        F.size(lines_col(t)).alias("n_lines"),
        dup_line_fraction_col(t).alias("dup_line_fraction"),
        dup_line_char_fraction_col(t).alias("dup_line_char_fraction"),
        dup_word_fraction_col(t).alias("dup_word_fraction"),
        dup_ngram_fraction_col(t, 5).alias("dup_5gram_fraction"),
    )
    return per_row.join(
        top_bigram_char_fraction(docs, id_col, text_col), id_col
    )
