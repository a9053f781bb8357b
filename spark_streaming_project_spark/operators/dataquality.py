"""Declarative data-quality checks (Deequ-style, engine-native): each rule
compiles to ONE aggregate (or one anti-join aggregate) and the report is
the union of single-row frames — (rule, violations).

Engine extension: the reference trusts its API feed and null-filters
defensively inside every query (`Consumer.scala:194,209-212,246,258,270`);
an ingestion pipeline at scale promotes those implicit guards into an
explicit, reportable contract run before data is admitted.

Scale notes (100 TB):
- not_null / in_set / range / custom-predicate rules are single-scan
  conditional counts (map-side combinable; multiple rules on the SAME
  table could share one scan — kept one-frame-per-rule here for
  composability, Spark's scan reuse dedupes the IO).
- unique compiles to count(*) - count(distinct cols) — one shuffle on the
  key, no self-join.
- foreign-key compiles to a LEFT ANTI join (broadcast when the parent is
  a dimension) counting orphans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "check_not_null",
    "check_unique",
    "check_in_set",
    "check_range",
    "check_predicate",
    "check_foreign_key",
    "dq_report",
]


def _one_row(rule: str, violations: Column, df: DataFrame) -> DataFrame:
    return df.agg(violations.cast("bigint").alias("violations")).select(
        F.lit(rule).alias("rule"), "violations"
    )


def check_not_null(df: DataFrame, col: str, rule: str | None = None) -> DataFrame:
    return _one_row(
        rule or f"not_null:{col}",
        F.count(F.when(F.col(col).isNull(), 1)),
        df,
    )


def check_unique(
    df: DataFrame, cols: list[str], rule: str | None = None
) -> DataFrame:
    """Violations = rows beyond the first per key (count - distinct).
    NULL keys participate like any other value (countDistinct ignores
    rows where ANY key col is NULL, so those rows count as violations —
    pair with not_null on the key when NULLs are legal)."""
    return _one_row(
        rule or f"unique:{','.join(cols)}",
        F.count(F.lit(1)) - F.countDistinct(*[F.col(c) for c in cols]),
        df,
    )


def check_in_set(
    df: DataFrame, col: str, allowed: list, rule: str | None = None
) -> DataFrame:
    """NULL is not a violation (use not_null for that)."""
    return _one_row(
        rule or f"in_set:{col}",
        F.count(
            F.when(F.col(col).isNotNull() & ~F.col(col).isin(allowed), 1)
        ),
        df,
    )


def check_range(
    df: DataFrame, col: str, lo, hi, rule: str | None = None
) -> DataFrame:
    """Violations = non-NULL values outside [lo, hi]."""
    c = F.col(col)
    return _one_row(
        rule or f"range:{col}",
        F.count(F.when(c.isNotNull() & ((c < lo) | (c > hi)), 1)),
        df,
    )


def check_predicate(
    df: DataFrame, pred: Column, rule: str
) -> DataFrame:
    """Violations = rows where ``pred`` is NOT satisfied (NULL counts as a
    violation — the contract must hold affirmatively)."""
    return _one_row(rule, F.count(F.when(~pred.eqNullSafe(F.lit(True)), 1)), df)


def check_foreign_key(
    child: DataFrame,
    col: str,
    parent: DataFrame,
    parent_col: str,
    rule: str | None = None,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Violations = child rows whose non-NULL key has no parent (orphans).
    LEFT ANTI join; the parent side is broadcast by default (dimensions)."""
    keys = parent.select(F.col(parent_col).alias(col)).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    orphans = child.filter(F.col(col).isNotNull()).join(keys, col, "left_anti")
    return _one_row(rule or f"fk:{col}", F.count(F.lit(1)), orphans)


def dq_report(checks: list[DataFrame]) -> DataFrame:
    """Union the per-rule single-row frames into the (rule, violations)
    report. Order-insensitive; callers sort for display."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
