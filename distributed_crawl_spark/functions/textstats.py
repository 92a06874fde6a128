"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All closed-form Column expressions over built-in functions — zero Python
in the executor path, fully whole-stage-codegen'd, and each reproducible
in ANSI SQL so the DuckDB oracle verifies values.

The reference crawler's only text metrics are P9 (word/char/line counts,
utils.py:635-657); the rest is this engine's corpus-curation extension.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import MERSENNE31, md5_int48, tokens

# n-gram/stopword heuristic language ID: tiny per-language marker lexicons
# (public high-frequency function words). Scores are whole-word hit counts;
# argmax with lexicographic tiebreak.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "and", "is", "of", "to", "in", "that", "it"],
    "es": ["el", "la", "los", "que", "es", "una", "para", "con"],
    "fr": ["le", "les", "des", "est", "une", "dans", "pour", "que"],
}

# Engine-wide "BPE-ish" pre-tokenizer: letter runs, digit runs, or single
# non-space symbols — the standard byte-pair pre-split shape.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_PUNCT_RE = r"[.,;:!?]"
_ALPHA_RE = r"[A-Za-z]"


def marker_hits(text: Column, words: list[str]) -> Column:
    """Whole-word occurrence count of any marker word (case-insensitive)."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pat))


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: marker_hits(text, ws) for lang, ws in sorted(LANG_MARKERS.items())}


def lang_id(text: Column) -> Column:
    """Predicted language: argmax marker-hit count, ties → lexicographically
    first language, 'und' (undetermined) when no marker hits at all.

    Expressed as greatest-of + case chain so the same logic is one SQL
    expression for the oracle.
    """
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # reverse order so earlier languages win ties via later when() override
    for lang in sorted(scores, reverse=True):
        pred = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(pred)
    return pred


def word_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def whitespace_token_count(text: Column) -> Column:
    return word_count(text)


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / symbols)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(_PUNCT_RE))


def alpha_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(_ALPHA_RE))


def stopword_count(text: Column) -> Column:
    """Hits of the union of all marker lexicons — a generic stopword rate."""
    all_words = sorted({w for ws in LANG_MARKERS.values() for w in ws})
    return marker_hits(text, all_words)


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality features; ratios rounded to absorb fp noise.

    - mean_word_len: alpha-ish proxy for gibberish (very long/short words)
    - punct_ratio:   punctuation per character
    - stop_ratio:    stopwords per word — near-0 suggests non-linguistic text
    - alpha_ratio:   letters per character
    """
    wc = word_count(text)
    cc = char_count(text)
    safe_wc = F.when(wc > 0, wc).otherwise(F.lit(1))
    safe_cc = F.when(cc > 0, cc).otherwise(F.lit(1))
    return {
        "word_count": wc,
        "char_count": cc,
        "mean_word_len": F.round((cc - wc + 1) / safe_wc, 4),
        "punct_ratio": F.round(punct_count(text) / safe_cc, 4),
        "stop_ratio": F.round(stopword_count(text) / safe_wc, 4),
        "alpha_ratio": F.round(alpha_count(text) / safe_cc, 4),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,100] quality score, integer (hash-stable across engines).

    score = 100 * clamp(alpha_ratio, 0, 1) weighted with stopword presence
    and a length prior; floor'd to int. The exact formula matters less than
    determinism + monotonicity in the signals.
    """
    f = quality_features(text)
    wc = f["word_count"]
    length_prior = F.when(wc >= 100, F.lit(1.0)).otherwise(wc / F.lit(100.0))
    raw = (
        F.lit(50.0) * f["alpha_ratio"]
        + F.lit(30.0) * F.least(f["stop_ratio"] * 5, F.lit(1.0))
        + F.lit(20.0) * length_prior
    )
    return F.floor(raw).cast("long")


def doc_fingerprint(text: Column) -> Column:
    """Order-sensitive rolling document fingerprint in [0, 2^31-1).

    fp = Σ_i (h48(tok_i) mod p) * ((i * 2654435761) mod p) mod p, all mod
    p = 2^31-1 term-wise so every intermediate fits BIGINT (ANSI-safe in
    Spark, reproducible in DuckDB). Unlike a token-set hash, swapping two
    tokens changes the fingerprint (position factor), which is the rolling
    property needed; computed as a closed-form aggregate over the token
    array — no explode, no shuffle.
    """
    toks = tokens(text)
    p = F.lit(MERSENNE31)
    knuth = F.lit(2654435761)
    result = F.aggregate(
        toks,
        F.struct(F.lit(0).cast("long").alias("acc"), F.lit(1).cast("long").alias("i")),
        lambda st, t: F.struct(
            (
                (
                    st["acc"]
                    + ((md5_int48(t) % p) * ((st["i"] * knuth) % p)) % p
                ) % p
            ).alias("acc"),
            (st["i"] + 1).alias("i"),
        ),
        lambda st: st["acc"],
    )
    return result
