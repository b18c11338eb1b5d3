"""PII redaction over the documents corpus — the scrubbing pass every
training-data pipeline runs before a crawl becomes a corpus (emails, phone
numbers, IP addresses, SSN-shaped ids masked to typed placeholder tokens,
with per-category counts kept for auditing).

The reference pipeline has no PII surface (Wikipedia list pages are already
public curated text); this operator is part of the LLM-data family built on
top of the same engine, alongside the quality/line/dedup filters.

Design constraints, in order:

  * **All codegen.** Every pattern runs as `regexp_replace` / `regexp_count`
    column expressions inside whole-stage codegen — the operator is a narrow
    map over the scan with zero shuffles and zero Python, so at 100 TB it is
    scan-bound by construction.
  * **Portable regex dialect.** Patterns are written in the intersection of
    Java regex (Spark executors) and RE2 (DuckDB oracles, Go/Rust tooling):
    explicit `[0-9]` classes, `\\b` word boundaries, bounded quantifiers —
    no lookarounds, no backreferences, no `\\d` (Java would accept a
    UNICODE_CHARACTER_CLASS variant DuckDB doesn't have).
  * **Disjoint-by-construction categories.** Counts are computed on the
    ORIGINAL text, replacements apply sequentially in declaration order.  For
    text where two patterns could overlap (an SSN-shaped id inside a longer
    digit run, a dotted phone that a later pass might read as an IPv4) the
    declaration order below resolves the ambiguity the way the category
    semantics want: email first (its local part may contain digits and dots),
    then the most-specific digit shapes (SSN 3-2-4 before phone 3-3-4), IPv4
    last.  The counts therefore equal the replacement counts whenever the
    matches are pairwise disjoint — which the category shapes guarantee for
    well-formed inputs — and the sequential-replacement text is authoritative
    otherwise (test-pinned in tests/test_redact.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (category, pattern, placeholder) — order is the sequential-replacement
# order and the ambiguity-resolution order (see module docstring).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ssn",
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "<ID>",
    ),
    (
        "phone",
        r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
)


def redact_pii(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Mask PII in ``text_col`` and count what was masked.

    Output: every input column, with ``text_col`` REPLACED by its redacted
    form, plus one ``n_<category>`` long per pattern (match count on the
    original text) and ``n_pii`` (their sum).

    One narrow projection — no shuffle, no UDF; at dump scale this pipelines
    with the quality/line filters in the same scan stage (the curate
    composite's filter prefix stays exchange-free with redaction added).
    """
    redacted = F.col(text_col)
    total = F.lit(0).cast("long")
    counts = {}
    for cat, pat, token in PII_PATTERNS:
        n = F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        counts[f"n_{cat}"] = n
        total = total + n
        redacted = F.regexp_replace(redacted, pat, token)
    # single withColumns call: every expression resolves against the INPUT
    # text column (counts on the original, redaction replacing it) — a
    # sequential withColumn chain would rebind later counts to the already-
    # redacted column
    return documents.withColumns(
        {text_col: redacted, **counts, "n_pii": total}
    )
