"""Text-analysis operators: quality scoring, language ID, token
counting, fingerprinting. All JVM-side expressions (split / transform /
aggregate / regexp) — no Python in the hot path — so they hold their
throughput at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Tiny function-word table for the heuristic language scorer. The
#: synthetic corpus is English-like; real corpora extend this map (or
#: plug a fastText-style model in via mapInPandas).
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "das", "und", "zu"),
    "es": ("el", "la", "los", "y", "de"),
    "fr": ("le", "la", "les", "et", "de"),
}

#: BPE-ish token classes: letter runs, digit runs, single other glyphs.
TOKEN_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _count_in(words, vocab: tuple[str, ...]):
    return F.size(F.array_intersect(words, F.array(*[F.lit(w) for w in vocab])))


def _hits(words, vocab: tuple[str, ...]):
    """Total (with repeats) occurrences of vocab words."""
    return F.size(F.filter(words, lambda w: w.isin(*vocab)))


def quality_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Cheap quality signals: length, word count, type-token ratio,
    stopword ratio, mean word length. The standard pre-training corpus
    filters (C4/Gopher-style heuristics) are compositions of these."""
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    stop_hits = _hits(words, STOPWORDS["en"])
    total_word_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        F.round(n_distinct.cast("double") / n_words, 4).alias("type_token_ratio"),
        F.round(stop_hits.cast("double") / n_words, 4).alias("stopword_ratio"),
        F.round(total_word_chars.cast("double") / n_words, 4).alias("mean_word_len"),
    )


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic language ID: function-word vote per language, argmax
    with deterministic tie order (en > de > es > fr, else 'und')."""
    words = F.split(F.col(text_col), " ")
    votes = {lang: _hits(words, vocab) for lang, vocab in STOPWORDS.items()}
    best = F.greatest(*votes.values())
    predicted = (
        F.when(best == 0, "und")
        .when(votes["en"] == best, "en")
        .when(votes["de"] == best, "de")
        .when(votes["es"] == best, "es")
        .otherwise("fr")
    )
    return df.select(
        F.col(id_col),
        predicted.alias("predicted_lang"),
        votes["en"].alias("en_hits"),
        best.alias("best_hits"),
    )


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + bytes.
    The unit economics column set for corpus budgeting."""
    return df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(TOKEN_REGEX)).alias("regex_tokens"),
        F.octet_length(text_col).alias("n_bytes"),
    )


def fingerprints(df: DataFrame, text_col: str, id_col: str, shingle_n: int = 3) -> DataFrame:
    """Document fingerprints: sha-256 of whitespace-normalised text
    (exact-dup key) + min-shingle hash (winnowing-style content key
    that survives local edits)."""
    from .dedup import word_shingles

    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    shingle_hashes = F.transform(
        word_shingles(norm, shingle_n), lambda s: F.sha2(s.cast("binary"), 256)
    )
    return df.select(
        F.col(id_col),
        F.sha2(norm.cast("binary"), 256).alias("content_sha"),
        F.array_min(shingle_hashes).alias("min_shingle_sha"),
    )
