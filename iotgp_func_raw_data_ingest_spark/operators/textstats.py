"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting — all JVM built-ins (regex + higher-order array
functions), designed to run as one narrow projection pass over 100 TB.

These are the per-document scalar features an LLM-data pipeline computes
before filtering/deduplicating a corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iotgp_func_raw_data_ingest_spark.operators.dedup import words

# BPE-ish regex: word pieces OR single non-space punctuation — a cheap,
# deterministic proxy for subword token counts.
BPE_TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

# Tiny deterministic stopword sets for the language-ID heuristic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "zu", "den", "von", "ist", "mit", "nicht"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "que"],
}


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish token count: regexp-extracted word pieces + punctuation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    toks = words(col)
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS[lang])))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def mean_word_len(col: Column | str) -> Column:
    toks = words(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Heuristic [0,1] quality score: favors mid-length documents with low
    punctuation density and a natural stopword rate. Deterministic and
    SQL-replayable; weights are arbitrary but fixed."""
    n_tok = token_count_ws(col)
    length_term = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 5, F.lit(1.0))
    stop_term = F.least(stopword_ratio(col, "en") * 5, F.lit(1.0))
    return F.round(0.5 * length_term + 0.3 * punct_term + 0.2 * stop_term, 4)


def lang_id(col: Column | str) -> Column:
    """N-gram-free heuristic language ID: highest stopword-hit ratio wins
    (ties break by language code order); no hits → 'und' (undetermined)."""
    scores = [(lang, stopword_ratio(col, lang)) for lang in sorted(STOPWORDS)]
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    for lang, score in reversed(scores):  # earlier langs win ties → apply last
        result = F.when((best_score > 0) & (score == best_score), F.lit(lang)).otherwise(result)
    return result


def fingerprint(col: Column | str) -> Column:
    """Whitespace-normalized md5 content fingerprint (portable across
    engines; swap for xxhash64 in production for speed)."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(normalized.cast("binary"))


def rolling_hash_fingerprints(col: Column | str, window: int = 8) -> Column:
    """Winnowing-style shingle fingerprints: md5 of each word-`window`-gram
    — the building block for fuzzy containment detection. Returns the
    lexicographic minimum per document (the 'winnowed' representative)."""
    from iotgp_func_raw_data_ingest_spark.operators.dedup import word_shingles

    grams = word_shingles(col, window)
    return F.array_min(F.transform(grams, lambda g: F.md5(g.cast("binary"))))


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Full per-document text-analysis profile in one projection pass."""
    return df.select(
        F.col(id_col),
        token_count_ws(text_col).cast("long").alias("n_tokens_ws"),
        token_count_bpe(text_col).cast("long").alias("n_tokens_bpe"),
        F.round(stopword_ratio(text_col, "en"), 4).alias("stopword_ratio"),
        F.round(punct_ratio(text_col), 4).alias("punct_ratio"),
        F.round(mean_word_len(text_col), 4).alias("mean_word_len"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fingerprint"),
    )
