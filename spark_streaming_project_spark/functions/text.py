"""Text-analysis column functions (BASELINE.json north-star: token counting,
shingling, fingerprinting, quality scoring, language ID).

All built on Spark built-ins (JVM-side, codegen'd); nothing here touches
Python per row. Tokenization is whitespace-based with a BPE-ish regex
fallback for mixed text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish token pattern: letter runs, digit runs, single non-space symbols.
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

ROLLING_PRIME = 1_000_000_007
ROLLING_BASE = 31


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, empty strings removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish regex tokens (letters / digits / symbols)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(F.lower(c), F.lit(BPE_TOKEN_RE))


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """ALL word n-grams in order (duplicates kept — the unit for counting
    statistics: PMI, repetition). Array-level: no explode, no shuffle;
    n-grams as a zip_with fold over n shifted views of the token array —
    two array passes instead of a per-index slice (higher-order lambdas
    are interpreted, not codegen'd, so pass count dominates cost at
    scale)."""
    toks = tokens(col)
    width = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, width)
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, width)
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return grams


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the text (the unit for MinHash /
    Jaccard dedup). Array-level: no explode, no shuffle."""
    return F.array_distinct(word_ngrams(col, n))


def rolling_fingerprint(col: Column | str) -> Column:
    """Order-sensitive polynomial rolling hash over tokens:
    ``acc = (acc*31 + (len(tok)*31 + ascii(tok[0]))) mod p`` — a content
    fingerprint that is cheap, deterministic, and cross-engine expressible."""
    tok_val = lambda t: (F.length(t) * ROLLING_BASE + F.ascii(F.substring(t, 1, 1)))
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * ROLLING_BASE + tok_val(t)) % ROLLING_PRIME,
    )


#: Tiny per-language stopword profiles for the n-gram/stopword heuristic.
LANG_PROFILES = {
    "en": ("the", "a", "and", "of", "to"),
    "fr": ("le", "la", "et", "de", "un"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "la", "y", "de", "que"),
}


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword hit counts over the token array."""
    toks = tokens(col)
    return {
        lang: F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))
        for lang, words in LANG_PROFILES.items()
    }


def predict_lang(col: Column | str) -> Column:
    """Argmax language by stopword hits; 'und' (undetermined) when all zero.
    Ties resolved in fixed profile order (en, fr, de, es)."""
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # first language in profile order with the strictly-highest score wins
    for lang in ("en", "fr", "de", "es"):
        s = scores[lang]
        cond = s > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    return best_lang
