"""Text-analysis operators for training-data pipelines.

These extend the reference's text function surface (function/text/*.java)
with the operators a 100 TB document pipeline needs: language-ID, quality
scoring, token counting, document fingerprinting.  All are built-in-only
Column expressions (whole-stage codegen; no Python UDFs), so they run at
scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from arcadedb_spark.text.fulltext import tokenize

# Tiny per-language stopword seeds for the n-gram/stopword heuristic.
# Deliberately small: language ID at pipeline scale is a ratio test, not a
# classifier — ambiguous docs fall through to 'und'.
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "a"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "las", "es", "no", "un", "una", "en", "por"],
    "it": ["il", "la", "che", "e", "è", "non", "un", "una", "per", "con"],
}


def token_count(col) -> Column:
    """Whitespace-ish token count (BPE-approximating regex split)."""
    return F.size(tokenize(col))


def word_tokens(col) -> Column:
    return tokenize(col)


def stopword_hits(col, lang: str = "en") -> Column:
    toks = tokenize(col)
    sw = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(toks), sw))


def language_id(col) -> Column:
    """Stopword-ratio language heuristic → 2-letter code or 'und'.

    Picks the language whose stopword seeds hit the most distinct tokens;
    requires ≥2 hits to claim a language.
    """
    col = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(tokenize(col))
    scores = [
        (lang, F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))))
        for lang, words in _STOPWORDS.items()
    ]
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # reversed so the first language wins ties deterministically
    for lang, s in reversed(scores):
        out = F.when((s == best_score) & (best_score >= 2), F.lit(lang)).otherwise(out)
    return out


def quality_score(col) -> Column:
    """Heuristic doc quality in [0,1]: length band, punctuation ratio,
    alpha ratio, repetition (distinct/total tokens).

    The formula is deterministic and SQL-expressible so a DuckDB oracle
    can replicate it exactly (CORRECTNESS gate).
    """
    col = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(col)
    toks = tokenize(col)
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))

    len_score = F.when(n_tok >= 20, 1.0).otherwise(n_tok / F.lit(20.0))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    punct_penalty = F.when(n_chars > 0, 1.0 - F.least(F.lit(1.0), 10.0 * punct / n_chars)).otherwise(F.lit(0.0))
    rep_score = F.when(n_tok > 0, n_distinct / n_tok).otherwise(F.lit(0.0))
    return (len_score * 0.3 + alpha_ratio * 0.3 + punct_penalty * 0.2 + rep_score * 0.2)


def fingerprint(col, num_hashes: int = 8, shingle_size: int = 3) -> Column:
    """Winnowing-style document fingerprint: min-k of xxhash64 over
    token shingles — a compact array<long> signature usable for
    near-duplicate candidate generation.
    """
    col = F.col(col) if isinstance(col, str) else col
    toks = tokenize(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - shingle_size, F.lit(0)))
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, shingle_size))
    )
    hashes = F.transform(shingles, lambda s: F.xxhash64(s))
    return F.slice(F.array_sort(F.array_distinct(hashes)), 1, num_hashes)


def exact_fingerprint(col) -> Column:
    """Normalization-invariant exact-dup key: md5 of lowercased,
    whitespace-collapsed text."""
    col = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.md5(norm.cast("binary"))
