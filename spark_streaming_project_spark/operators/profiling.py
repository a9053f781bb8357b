"""Data profiling — the observability ops a pipeline runs before committing
to a plan: numeric histograms (is this column skewed/bimodal/clipped?) and
key-skew profiles (will this join/groupBy key melt a reducer?).

Both are single-scan aggregations with engine-portable arithmetic, so a
DuckDB oracle replays them exactly; at 100 TB they are the cheap probes that
decide salting, partition counts, and bucket layouts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(col: Column | str, lo: float, hi: float, n_buckets: int) -> Column:
    """Equal-width bucket index in [0, n_buckets): floor((x-lo)/width),
    clamped at both ends. floor + clamp instead of width_bucket() so the
    expression is bit-identical on any engine (width_bucket edge semantics
    differ); NULL in -> NULL out."""
    c = F.col(col) if isinstance(col, str) else col
    width = (hi - lo) / n_buckets
    raw = F.floor((c.cast("double") - F.lit(lo)) / F.lit(width)).cast("long")
    return F.when(
        c.isNotNull(),
        F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1)),
    )


def numeric_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
) -> DataFrame:
    """Equal-width histogram: (bucket, lo_edge, row_count, min_val,
    max_val) per non-empty bucket. One scan, one hash aggregate on a
    bounded key domain (≤ n_buckets groups) — the profile is effectively
    free at any scale, and min/max per bucket expose clipping at the
    clamped edges."""
    b = bucketize(col, lo, hi, n_buckets)
    width = (hi - lo) / n_buckets
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(
            F.count("*").alias("row_count"),
            F.min(F.col(col).cast("double")).alias("min_val"),
            F.max(F.col(col).cast("double")).alias("max_val"),
        )
        .withColumn("lo_edge", (F.lit(lo) + F.col("bucket") * F.lit(width)))
        .select("bucket", "lo_edge", "row_count", "min_val", "max_val")
    )


def skew_profile(df: DataFrame, key_col: str, k: int = 20) -> DataFrame:
    """Top-k hottest keys with their share of all rows: (key, key_count,
    total_rows, share). The pre-flight check for any join/groupBy on the
    key — a share near 1/shuffle-partitions means one reducer owns the key
    and salting (operators/joins.skew_salted_join) is warranted.

    Shape: one hash aggregate on the key (map-side combined), a broadcast
    of the single-row total, and a TakeOrderedAndProject — no global sort,
    no second scan. Ties break by key value for a total order.
    """
    counts = df.filter(F.col(key_col).isNotNull()).groupBy(key_col).agg(
        F.count("*").alias("key_count")
    )
    total = df.filter(F.col(key_col).isNotNull()).agg(
        F.count("*").alias("total_rows")
    )
    return (
        counts.join(F.broadcast(total))
        .withColumn(
            "share",
            F.round(F.col("key_count") / F.col("total_rows"), 6),
        )
        .orderBy(F.desc("key_count"), F.asc(key_col))
        .limit(k)
    )
