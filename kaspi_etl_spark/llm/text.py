"""Text analysis — language ID, quality scoring, token counting,
fingerprinting. All JVM-side expressions (no UDFs): at 100 TB these run
inside whole-stage codegen, narrow (no shuffle), and column-pruned to the
text column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny stopword marker sets per language for the n-gram/stopword heuristic.
# Deliberately small and deterministic — the point is the Spark shape
# (scoring via expression trees), not lexical coverage.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "une"],
    "es": ["el", "la", "que", "de", "los", "es", "una", "por"],
    "ru": ["и", "в", "не", "на", "что", "это", "как", "по"],
}

TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"  # BPE-ish pre-tokenizer split


def _count_word(text: Column, word: str) -> Column:
    # Count whole-word occurrences of a marker word.
    return F.size(F.regexp_extract_all(text, F.lit(rf"\b{word}\b"), F.lit(0)))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts."""
    lowered = F.lower(text)
    return {
        lang: sum((_count_word(lowered, w) for w in words), F.lit(0))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(
    text: Column,
    default: str = "und",
    markers: dict[str, list[str]] | None = None,
) -> Column:
    """Language ID: argmax of marker counts; ties broken by language code
    order; no hits at all -> ``default``. Pass an ASCII-only ``markers``
    subset when oracle parity matters (regex \\b is ASCII in RE2 engines
    but Unicode-aware in Java)."""
    scores = lang_scores(text) if markers is None else {
        lang: sum((_count_word(F.lower(text), w) for w in words), F.lit(0))
        for lang, words in markers.items()
    }
    langs = sorted(scores)  # deterministic tie-break: first (asc) code wins
    best = F.lit(None).cast("string")
    best_s = F.lit(-1)
    for lang in langs:
        s = scores[lang]
        take = s > best_s
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_s = F.when(take, s).otherwise(best_s)
    return F.when(best_s > 0, best).otherwise(F.lit(default))


def whitespace_token_count(text: Column) -> Column:
    """Whitespace tokenization count (empty/blank -> 0)."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def regex_token_count(text: Column) -> Column:
    """BPE-ish pre-tokenizer count: letter runs, digit runs, punctuation."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0))).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring features (length, punctuation ratio, stopword ratio,
    mean word length) + a blended 0..1 quality score.

    The score formula is this engine's own (the reference has no text
    pipeline); components are standard web-corpus heuristics.
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_ws_tokens = whitespace_token_count(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), F.lit(0))).cast("long")
    n_stop = sum(
        (_count_word(F.lower(t), w) for w in LANG_MARKERS["en"]), F.lit(0)
    ).cast("long")
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_ws_tokens > 0, n_stop.cast("double") / n_ws_tokens.cast("double")
    ).otherwise(F.lit(0.0))
    mean_word_len = F.when(
        n_ws_tokens > 0,
        (n_chars - n_ws_tokens + 1).cast("double") / n_ws_tokens.cast("double"),
    ).otherwise(F.lit(0.0))
    length_score = F.least(F.lit(1.0), n_chars.cast("double") / F.lit(500.0))
    quality = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.0),
            F.lit(0.4) * length_score
            + F.lit(0.3) * F.least(F.lit(1.0), stop_ratio * F.lit(5.0))
            + F.lit(0.3) * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * F.lit(10.0))),
        ),
    )
    return df.select(
        "*",
        n_chars.alias("n_chars_m"),
        n_ws_tokens.alias("n_tokens_ws"),
        regex_token_count(t).alias("n_tokens_re"),
        n_punct.alias("n_punct"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_word_len.alias("mean_word_len"),
        quality.alias("quality_score"),
    )


def doc_fingerprint(text: Column, k: int = 8, shingle_words: int = 3) -> Column:
    """Document fingerprint: the k smallest 60-bit hashes over word
    shingles (a winnowing-style rolling signature). Expression-only —
    shingles via word-array slicing, hash via md5-prefix (portable to any
    SQL oracle), bottom-k via array_sort + slice.
    """
    from .dedup import md5_long, word_shingles

    hashes = F.transform(
        word_shingles(text, shingle_words), lambda s: md5_long(s)
    )
    return F.slice(F.array_sort(F.array_distinct(hashes)), 1, k)
