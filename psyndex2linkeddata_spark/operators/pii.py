"""PII scrubbing for web-scale training-data pipelines.

A 100-TB text corpus headed into a training set needs emails, phone
numbers, and IP addresses masked before anything else touches it. This
is a pure native regexp_replace chain — no UDF, whole-stage codegen,
fully pushdown-friendly — so it costs one projection over the scan.

Patterns deliberately stay in the common Java-regex/RE2 subset (no
lookaround, no backrefs) so the DuckDB oracle can run the identical
chain; replacement ORDER matters (emails first: an email contains
digit runs a phone pattern could half-mask).

Scale note: this belongs fused into the first projection after the
scan (one pass over `text`), never as a separate job — at 100 TB the
scan dominates, and Catalyst collapses the chain into the same stage
as any downstream tokenization/dedup prep.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# (pattern, replacement) in application order — keep in the Java/RE2
# common subset and mirror any edit in the __spark_entry__ oracle SQL.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    (r"\+\d{1,3}[ -]?\d{2,4}[ -]?\d{3,4}[ -]?\d{3,6}", "[PHONE]"),
    (r"\b\d{3}[ -]\d{3,4}[ -]\d{4}\b", "[PHONE]"),
]


def scrub_pii(col: Column) -> Column:
    """Mask emails / IPv4 addresses / phone-shaped digit runs."""
    out = col
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-document counts of each PII class (pre-scrub), for corpus
    audits; apply to the SAME projection as scrub_pii so the scan is
    shared."""
    return {
        "n_emails": F.regexp_count(col, F.lit(PII_PATTERNS[0][0])),
        "n_ips": F.regexp_count(col, F.lit(PII_PATTERNS[1][0])),
    }
