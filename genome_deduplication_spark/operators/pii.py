"""PII detection + redaction: emails, IPv4 addresses, phone numbers.

The standard pre-release hygiene pass of every webtext training pipeline
(C4 strips lines by blocklist; FineWeb/Dolma regex-redact emails/IPs):
match conservative regexes and replace each occurrence with a typed
placeholder, reporting per-document counts. The reference's analogue is
the masking pass that rewrites flagged subsequences in place
(code/dedup2.py:497-520, N-masking of retained duplicate spans) — here
the rewrite targets are pattern matches instead of duplicate k-mer runs.

Scale shape: pure row-local ``regexp_replace``/``regexp_count`` column
expressions — one codegen Project, no shuffle, no Python. Patterns are
deliberately restricted to the RE2-compatible subset (character classes,
bounded repeats, non-capturing groups — no backrefs, no lookaround) so
the DuckDB oracle runs the IDENTICAL pattern strings.

Replacement order is part of the contract (email -> ipv4 -> phone):
counts are taken on the original text, then replacements apply in that
fixed order so overlapping matches resolve deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "redact_pii"]

# (name, regex, placeholder) — order is the replacement order
PII_PATTERNS = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3} \d{3} \d{3,4}", "<PHONE>"),
]


def redact_pii(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per doc: (id, n_emails, n_ipv4s, n_phones, redacted_text).

    Counts are non-overlapping matches on the ORIGINAL text; the
    redacted text applies the placeholder substitutions in
    ``PII_PATTERNS`` order.
    """
    text = F.col(text_col)
    counts = [
        F.regexp_count(text, F.lit(pat)).alias(f"n_{name}s")
        for name, pat, _ in PII_PATTERNS
    ]
    red = text
    for _, pat, placeholder in PII_PATTERNS:
        red = F.regexp_replace(red, pat, placeholder)
    return docs.select(id_col, *counts, red.alias("redacted_text"))
