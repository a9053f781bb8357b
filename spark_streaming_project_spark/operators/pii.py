"""PII detection and redaction over text columns — the scrubbing pass a
training-data pipeline runs before anything ships (emails, phone numbers,
IP addresses; the Dolma / BigScience ROOTS rule family).

Engine extension beyond the reference's cleaning tier (closest reference
shape: the regex field cleaning at ``Consumer.scala:73-88``); same
declarative `regexp_*` style, applied to free text instead of tags.

Scale shape: both operators are PURE PROJECTIONS — one `regexp_count` /
`regexp_replace` chain per pattern, fully inside whole-stage codegen, no
shuffle, no Python. Scanning 100 TB is an embarrassingly parallel map
pass whose cost is the scan itself; column pruning and partition pruning
pass straight through.

Pattern notes: the default patterns use only char classes, bounded
quantifiers and ASCII word boundaries, the subset with IDENTICAL
semantics in Java regex (Spark, codegen'd) and RE2 (the DuckDB oracle) —
no lookaround, no backreferences. Known, documented trade: dotted
version strings ("pip 1.2.3.4") match the IPv4 rule; production rule
packs tune patterns per corpus, the machinery is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies left-to-right (patterns are disjoint — the
# email rule consumes its digits before phone/ipv4 could see them).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(text: Column, patterns: dict[str, str] | None = None) -> list[Column]:
    """One `pii_<name>_n` count column per pattern (0 for NULL text)."""
    pats = patterns or PII_PATTERNS
    return [
        F.coalesce(
            F.regexp_count(text, F.lit(pat)), F.lit(0)
        ).alias(f"pii_{name}_n")
        for name, pat in pats.items()
    ]


def pii_scan(
    df: DataFrame,
    text_col: str,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Append per-category match counts plus a `pii_total_n` sum.

    A pure projection: downstream filters on the counts (e.g. "drop any
    document with pii_total_n > 0") push into the same scan stage.
    """
    pats = patterns or PII_PATTERNS
    counts = pii_counts(F.col(text_col), pats)
    out = df.select("*", *counts)
    total = None
    for name in pats:
        c = F.col(f"pii_{name}_n")
        total = c if total is None else total + c
    return out.withColumn("pii_total_n", total)


def pii_redact(
    df: DataFrame,
    text_col: str,
    out_col: str | None = None,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Replace every match of every pattern with a typed `<NAME>`
    placeholder (email -> `<EMAIL>`), left-to-right in `patterns` order.
    Idempotent: placeholders contain no digits or `@`, so a second pass
    is a no-op. NULL text stays NULL.
    """
    pats = patterns or PII_PATTERNS
    expr: Column = F.col(text_col)
    for name, pat in pats.items():
        expr = F.regexp_replace(expr, pat, f"<{name.upper()}>")
    return df.withColumn(out_col or text_col, expr)
