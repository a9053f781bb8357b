"""Slowly-changing-dimension (type 2) maintenance.

Engine extension: the reference's sink story is overwrite/append JDBC
tables (`Consumer.scala:286-316`); a warehouse also needs MERGE-shaped
dimension maintenance. ``scd2_apply`` is the declarative Spark form of the
classic SCD2 merge: close changed current rows, insert new versions, keep
history untouched.

Scale notes (100 TB dimension):
- One equi-join on the business key between the CURRENT slice and the
  update batch (update batches are typically small: broadcastable —
  callers can wrap ``updates`` in ``F.broadcast``); history rows are
  passed through untouched with no shuffle at all.
- Unions are narrow; the result partitioning is the scan partitioning.
- No window functions, no global ordering anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["scd1_apply", "scd2_apply", "snapshot_diff"]


def _differs(tracked: list[str]) -> Column:
    """NULL-safe 'any tracked attribute changed' predicate between the
    current row (``cur_<c>``) and the update row (``upd_<c>``)."""
    cond = F.lit(False)
    for c in tracked:
        cond = cond | ~F.col(f"cur_{c}").eqNullSafe(F.col(f"upd_{c}"))
    return cond


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective: Column,
) -> DataFrame:
    """Merge an update batch into an SCD2 dimension.

    ``dim`` columns: ``key``, ``tracked...``, ``valid_from``, ``valid_to``
    (NULL = open), ``is_current``. ``updates`` columns: ``key``,
    ``tracked...``. ``effective`` is the batch effective date/timestamp
    expression applied to every change.

    Semantics (standard type-2 merge):
    - key in updates, any tracked attribute differs from the CURRENT row ->
      current row closes (``valid_to = effective``, ``is_current = false``)
      and a new open row with the update's attributes is inserted;
    - key in updates with identical attributes -> untouched;
    - key not in updates -> untouched;
    - key only in updates (new member) -> one new open row.
    History (non-current) rows never join, never shuffle.
    """
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))

    cur_sel = cur.select(
        F.col(key),
        F.lit(True).alias("_in_cur"),
        *[F.col(c).alias(f"cur_{c}") for c in tracked],
        "valid_from",
        "valid_to",
        "is_current",
    )
    upd_sel = updates.select(
        F.col(key),
        F.lit(True).alias("_in_upd"),
        *[F.col(c).alias(f"upd_{c}") for c in tracked],
    )
    j = cur_sel.join(upd_sel, key, "full_outer")
    changed = F.col("_in_upd").isNotNull() & (
        F.col("_in_cur").isNull() | _differs(tracked)
    )

    # untouched current rows (no update, or identical attributes)
    kept = j.filter(F.col("_in_cur").isNotNull() & ~changed).select(
        F.col(key),
        *[F.col(f"cur_{c}").alias(c) for c in tracked],
        "valid_from",
        "valid_to",
        "is_current",
    )
    # current rows closed by a differing update
    closed = j.filter(F.col("_in_cur").isNotNull() & changed).select(
        F.col(key),
        *[F.col(f"cur_{c}").alias(c) for c in tracked],
        "valid_from",
        effective.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    # new open versions (changed keys + brand-new keys)
    opened = j.filter(changed).select(
        F.col(key),
        *[F.col(f"upd_{c}").alias(c) for c in tracked],
        effective.alias("valid_from"),
        F.lit(None).cast(dim.schema["valid_to"].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return hist.unionByName(kept).unionByName(closed).unionByName(opened)


def scd1_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
) -> DataFrame:
    """Type-1 (latest-wins) upsert: update rows REPLACE dimension rows with
    the same key, new keys append, everything else passes through. No
    history — the overwrite-in-place counterpart of :func:`scd2_apply`.

    Shape: one LEFT ANTI join on the key (broadcastable update batches) +
    a union; the dimension is never shuffled beyond the anti-join probe.
    ``updates`` must carry the same columns as ``dim`` and at most one row
    per key (enforce upstream with dropDuplicates/window if the batch may
    contain multiple versions).
    """
    survivors = dim.join(updates.select(key), key, "left_anti")
    return survivors.unionByName(updates.select(*dim.columns))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Change-data-capture between two table snapshots: classify every
    business key as ``insert`` (new only), ``delete`` (old only), or
    ``update`` (present in both, any compared attribute NULL-safely
    different); unchanged keys are dropped. The batch complement to the
    SCD merges above — the op that turns periodic full snapshots into a
    change feed when the source system exposes no log.

    Scale shape: ONE full-outer equi-join on the business key (both
    sides pruned to key + compared columns before the shuffle), column
    comparison via null-safe predicates — no hashing, no window, no
    driver state; AQE handles key skew. Returns key_cols + change_type.
    """
    o = old.select(
        *[F.col(c).alias(f"k_{c}") for c in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"k_{c}") for c in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    joined = o.join(n, [f"k_{c}" for c in key_cols], "full_outer")
    return (
        joined.withColumn(
            "change_type",
            F.when(F.col("_in_old").isNull(), F.lit("insert"))
            .when(F.col("_in_new").isNull(), F.lit("delete"))
            .when(changed, F.lit("update")),
        )
        .filter(F.col("change_type").isNotNull())
        .select(
            *[F.col(f"k_{c}").alias(c) for c in key_cols], "change_type"
        )
    )
