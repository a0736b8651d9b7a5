"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure JVM-side string/array expressions — at 100 TB these run as maps
inside whole-stage codegen with zero Python round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from market_microstructure_toolkit_spark.operators.dedup import tokens

#: Tiny marker lexicons for the n-gram/stopword language heuristic. Real
#: corpora would use character n-gram profiles; the mechanism (count marker
#: hits per language, argmax) is the same and stays expression-only.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "y", "es", "una"),
    "it": ("il", "di", "che", "e", "per"),
    "zh": ("de", "shi", "bu", "le", "wo"),
}


def marker_hits(text_col: str, lang: str) -> Column:
    """Count of tokens belonging to ``lang``'s marker set."""
    toks = tokens(text_col)
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def lang_id_expr(text_col: str = "text") -> Column:
    """Heuristic language ID: argmax of marker-hit counts, deterministic
    alphabetical tie-break, 'und' (undetermined) when no marker hits."""
    langs = sorted(LANG_MARKERS)
    best = F.lit("und")
    best_hits = F.lit(0)
    # fold right-to-left so earlier (alphabetical) languages win ties
    for lang in reversed(langs):
        h = marker_hits(text_col, lang)
        best = F.when(h >= F.greatest(best_hits, F.lit(1)), F.lit(lang)).otherwise(best)
        best_hits = F.greatest(best_hits, h)
    return best


#: Small English stopword list for the stopword-ratio quality signal.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
)


def stopword_ratio(text_col: str = "text") -> Column:
    """Fraction of whitespace tokens that are (lowercased) stopwords;
    NULL for empty documents. Natural prose sits well above 0."""
    toks = tokens(text_col)
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-signal bundle: lengths, token stats, character-class +
    stopword ratios, and a composite [0,1] score (heuristic linear
    blend)."""
    t = F.col(text_col)
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    nonspace = F.length(F.regexp_replace(t, " ", ""))
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    digits = F.length(F.regexp_replace(t, "[^0-9]", ""))
    punct = F.length(F.regexp_replace(t, "[^.,;:!?]", ""))
    avg_tok = F.when(n_tok > 0, nonspace.cast("double") / n_tok)
    alpha_ratio = F.when(n_chars > 0, alpha.cast("double") / n_chars)
    digit_ratio = F.when(n_chars > 0, digits.cast("double") / n_chars)
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars)
    # crude composite: long-enough, alphabetic, not digit/punct heavy
    score = (
        F.least(n_tok.cast("double") / F.lit(20.0), F.lit(1.0)) * F.lit(0.4)
        + F.coalesce(alpha_ratio, F.lit(0.0)) * F.lit(0.4)
        + (F.lit(1.0) - F.least(F.coalesce(digit_ratio, F.lit(0.0)) * 5, F.lit(1.0)))
        * F.lit(0.1)
        + (F.lit(1.0) - F.least(F.coalesce(punct_ratio, F.lit(0.0)) * 10, F.lit(1.0)))
        * F.lit(0.1)
    )
    return df.withColumns(
        {
            "n_tokens": n_tok.cast("long"),
            "avg_token_len": avg_tok,
            "alpha_ratio": alpha_ratio,
            "digit_ratio": digit_ratio,
            "punct_ratio": punct_ratio,
            "stopword_ratio": stopword_ratio(text_col),
            "quality_score": score,
        }
    )


def fingerprint_expr(text_col: str = "text", prefix_chars: int = 64) -> Column:
    """Normalized-prefix fingerprint: lowercase, collapse whitespace, md5
    the first ``prefix_chars`` — a cheap near-exact-dup key that survives
    trailing edits (the rolling-hash fingerprint's practical cousin)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    return F.md5(F.substring(norm, 1, prefix_chars))


def token_count_bpe_ish(text_col: str = "text") -> Column:
    """BPE-ish token estimate without a tokenizer model: count word pieces
    after splitting on whitespace AND on letter/digit/punct boundaries
    (a regex approximation of byte-pair segmentation granularity)."""
    pieces = F.split(
        F.regexp_replace(
            F.col(text_col), "([0-9]+|[^a-zA-Z0-9 ])", " $1 "
        ),
        "\\s+",
        -1,
    )
    return F.size(F.filter(pieces, lambda p: p != F.lit("")))
