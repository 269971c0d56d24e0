"""PII detection and redaction for training-data curation.

Regex-based scrubbing of the classic machine-detectable PII classes
(emails, IPv4 addresses, SSN-shaped ids, phone numbers). Everything is
JVM ``regexp_replace`` / ``regexp_extract_all`` — whole-stage codegen,
no Python, no shuffle: a pure map stage over the corpus scan, which is
the only shape that survives 100 TB.

Patterns deliberately use the regex subset common to Java (Spark) and
RE2-style engines (word boundaries, character classes, bounded
quantifiers, non-capturing groups) so results are portable and
oracle-checkable. Real deployments layer an NER model on top for
names/addresses; that is a Pandas-UDF stage out of scope here — the
regex tier is the part every pipeline runs at full scale.

Replacement order matters: IPv4 before phone (both are digit runs with
separators), email first (contains digits and dots that later patterns
could nibble at).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: applied top to bottom.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # leading '+' as an ALTERNATIVE to \b, not after it (r10 review:
    # '\b\+?' can never take the '+' branch — there is no word
    # boundary between a space and '+', so '+1 555-...' redacted to
    # '+<PHONE>', leaking the prefix). (?:\+|\b) is RE2-safe, so the
    # DuckDB oracle replays it exactly.
    "phone": r"(?:\+|\b)\d{3}[-. ]\d{3,4}[-. ]\d{4}\b",
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(col: Column | str = "text") -> dict[str, Column]:
    """Per-class match counts on the raw text (computed independently
    per class, before any redaction)."""
    c = _c(col)
    return {
        f"n_{name}": F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


def redact_pii(
    col: Column | str = "text",
    classes: list[str] | None = None,
    token_fmt: str = "<{name}>",
) -> Column:
    """Replace every PII match with a typed placeholder token
    (``<EMAIL>``, ``<IPV4>``, ...). ``classes`` restricts/reorders the
    applied patterns."""
    c = _c(col)
    for name in classes or list(PII_PATTERNS):
        c = F.regexp_replace(c, PII_PATTERNS[name], token_fmt.format(name=name.upper()))
    return c


def scrub_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace ``text_col`` with its redacted form and append per-class
    match counts — the audit columns a compliance review needs."""
    counts = pii_counts(text_col)
    return df.withColumns(counts).withColumn(text_col, redact_pii(text_col))
