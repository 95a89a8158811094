"""PII detection + redaction over a text column (the C4/RefinedWeb scrub
pass: Raffel et al. 2020 strip pages on a blocklist + obvious PII; modern
curation pipelines redact emails/phones/IPs in place before pretraining).

Everything is built-in Catalyst expressions — ``regexp_extract_all`` /
``regexp_replace`` run JVM-side inside whole-stage codegen, so the scrub is
a scan-speed map with ZERO shuffles at any corpus size. Patterns are kept
inside the (large) syntax intersection of Java regex and RE2 (character
classes, bounded repetition, ``\\b``) so the DuckDB oracle twin executes the
IDENTICAL pattern strings — the cross-engine oracle pins the regex
semantics, not just the plumbing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Pattern / replacement pairs, applied in order. Order matters: emails are
# redacted before phones/IPs so digit runs inside an already-redacted tag
# can't double-match. All patterns are Java-regex AND RE2 compatible.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("phone", r"\b[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def pii_counts(text: Column) -> list[Column]:
    """One ``n_<kind>`` count column per PII pattern."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).alias(
            f"n_{kind}s"
        )
        for kind, pat, _ in PII_PATTERNS
    ]


def pii_redact(text: Column) -> Column:
    """The text with every PII match replaced by its typed tag, applying
    the patterns in PII_PATTERNS order."""
    out = text
    for _, pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-kind match counts and a ``redacted`` column to ``df``.

    Keeps every input column; the caller drops the raw text when writing
    the scrubbed corpus. Pure narrow projection — composes into whatever
    scan stage the pipeline already runs.
    """
    c = F.col(text_col)
    return df.select(
        "*", *pii_counts(c), pii_redact(c).alias("redacted")
    )
