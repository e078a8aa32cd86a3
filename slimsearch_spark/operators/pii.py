"""PII detection + redaction for training-data pipelines.

Regex-only (emails, IPv4 addresses, international-format phone numbers):
every expression is a built-in ``regexp_count`` / ``regexp_replace`` —
whole-stage codegen, zero Python, one narrow projection per document, so
the scrub sweeps 100 TB at parquet-scan speed exactly like the
textstats operators. (A production pipeline layers NER models on top via
a pandas UDF; the regex tier is the deterministic, dependency-free base
that catches the bulk of structured PII.)

Patterns deliberately use only syntax with identical semantics in Java
regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
quantifiers, ``\\b`` word boundaries — no lookaround, no backreferences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# +<country> then 2-3 more digit groups with optional single space/dash/dot
# separators, ending on a digit (greedy, alternation-free: Java
# backtracking and RE2 leftmost-longest agree on every match)
PHONE_RE = r"\+\d{1,3}(?:[-. ]?\d{2,4}){2,3}"

PII_PATTERNS = {
    "email": (EMAIL_RE, "<EMAIL>"),
    "ipv4": (IPV4_RE, "<IP>"),
    "phone": (PHONE_RE, "<PHONE>"),
}


def _scrubbed(col: Column) -> Column:
    # email first: an address can embed digit runs a later pattern would
    # otherwise bite into; ipv4 before phone so dotted quads never
    # half-match the phone separators
    for name in ("email", "ipv4", "phone"):
        pat, repl = PII_PATTERNS[name]
        col = F.regexp_replace(col, pat, repl)
    return col


def pii_stats(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, n_email, n_ipv4, n_phone) match counts per document.

    Counts run on the RAW text independently (not the progressively
    scrubbed form), so each column answers "how many of this PII class
    does the document contain" on its own."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_email"),
        F.regexp_count(t, F.lit(IPV4_RE)).alias("n_ipv4"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("n_phone"))


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Documents with ``text_col`` redacted in place: emails → ``<EMAIL>``,
    IPv4 → ``<IP>``, phones → ``<PHONE>``. All other columns pass through
    untouched — the scrub composes with dedup/sampling/packing downstream
    (run it FIRST so near-dup hashing sees the redacted form and redaction
    placeholders don't split duplicate clusters)."""
    return docs.withColumn(text_col, _scrubbed(F.col(text_col)))
