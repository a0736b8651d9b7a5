"""PII scrubbing and pseudonymization for training corpora.

Standard pre-training hygiene: regex-redact personally identifiable
spans (emails, IPs, phone-like digit groups) and replace stable natural
keys with deterministic surrogate keys before data leaves its source
domain. Everything here is JVM-side expression work (regexp_replace /
md5 / arithmetic) — whole-stage codegen, no UDFs, embarrassingly
parallel, no shuffle.

Pattern notes: the regexes stick to the syntax subset shared by Java's
`java.util.regex` (Spark) and RE2-style engines (so the DuckDB oracles
can mirror them verbatim): character classes, bounded repetition, no
look-behind. Redaction is repeated-pass regexp_replace, which replaces
ALL non-overlapping matches in both engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement token) — order matters: email before
#: digit-run so the mailbox's digits are not pre-mangled; IP before
#: phone so dotted quads don't half-match the phone pattern.
DEFAULT_PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ()]{7,}\d", "<PHONE>"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: Sequence[tuple[str, str, str]] = DEFAULT_PII_PATTERNS,
    out_col: str | None = None,
) -> DataFrame:
    """Replace every PII match with its placeholder token, in pattern
    order, plus one ``pii_<name>_hits`` count column per pattern
    (counted BEFORE redaction, on the original text)."""
    out_col = out_col or text_col
    text = F.col(text_col)
    counted = df.select(
        "*",
        *[
            F.regexp_count(text, F.lit(pat)).alias(f"pii_{name}_hits")
            for name, pat, _ in patterns
        ],
    )
    red: Column = F.col(text_col)
    for _, pat, token in patterns:
        red = F.regexp_replace(red, pat, token)
    return counted.withColumn(out_col, red)


def pseudonymize(
    df: DataFrame,
    key_col: str,
    salt: str,
    out_col: str = "pseudonym",
) -> DataFrame:
    """Deterministic surrogate key: md5(key || ':' || salt).

    Same input + salt -> same pseudonym everywhere (joins across
    pseudonymized tables still line up); without the salt the original
    is not recoverable by dictionary-hashing common values. Rotate the
    salt to unlink releases.
    """
    return df.withColumn(
        out_col, F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt)))
    )


def generalize_band(col: Column | str, width: float) -> Column:
    """k-anonymity-style numeric generalization: the value's band index
    at the given width (floor(x / width)). Banding is the standard
    quasi-identifier coarsening for numeric attributes."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c / F.lit(float(width))).cast("long")


__all__ = [
    "DEFAULT_PII_PATTERNS",
    "generalize_band",
    "pseudonymize",
    "redact_pii",
]
