"""Data profiling — the observability ops a pipeline runs before committing
to a plan: numeric histograms (is this column skewed/bimodal/clipped?) and
key-skew profiles (will this join/groupBy key melt a reducer?).

Both are single-scan aggregations with engine-portable arithmetic, so a
DuckDB oracle replays them exactly; at 100 TB they are the cheap probes that
decide salting, partition counts, and bucket layouts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def paired_stats(
    df: DataFrame,
    key_col: str,
    x_col: Column | str,
    y_col: Column | str,
) -> DataFrame:
    """Per-key Pearson correlation + means for two INTEGER columns, computed
    from exact integer sums with a single FP division at the end — so the
    result is bit-identical across engines and shuffle orders (builtin
    ``corr()`` accumulates doubles in partition order and drifts).

    One scan, one map-side-combinable aggregate: n, Σx, Σy, Σxy, Σx², Σy²
    per key; corr = (nΣxy − ΣxΣy) / √((nΣx²−(Σx)²)(nΣy²−(Σy)²)). The sums
    here are 64-bit (exact below 2⁵³ when widened to double); at warehouse
    scale swap them to DECIMAL(38,0) — the shape is unchanged.

    NULL in either column drops the row; keys whose variance is zero in
    either column get NULL corr.
    """
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("long")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("long")
    base = df.filter(x.isNotNull() & y.isNotNull()).select(
        F.col(key_col), x.alias("_x"), y.alias("_y")
    )
    agg = base.groupBy(key_col).agg(
        F.count("*").alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    return agg.select(
        F.col(key_col),
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(sx / n, 6).alias("mean_x"),
        F.round(sy / n, 6).alias("mean_y"),
        F.round(
            F.when((dx > 0) & (dy > 0), (n * sxy - sx * sy) / F.sqrt(dx * dy)), 6
        ).alias("corr_xy"),
    )


def spearman_corr(
    df: DataFrame,
    key_col: str,
    x_col: Column | str,
    y_col: Column | str,
) -> DataFrame:
    """Per-key Spearman rank correlation with the textbook tie handling
    (average ranks), deterministic across engines.

    Ranks are fractional under ties, so we carry DOUBLED average ranks —
    ``2*rank() + ties - 1``, an exact INTEGER — and feed them through the
    same exact-integer-sum Pearson as :func:`paired_stats` (correlation is
    affine-invariant, so the doubling cancels). One window pass per axis
    partitioned by key (the per-group sort IS the rank), then a single
    combinable aggregate; no builtin corr(), no partition-order FP drift.
    """
    from pyspark.sql import Window

    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("long")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("long")
    base = df.filter(x.isNotNull() & y.isNotNull()).select(
        F.col(key_col), x.alias("_x"), y.alias("_y")
    )
    wx = Window.partitionBy(key_col).orderBy("_x")
    wy = Window.partitionBy(key_col).orderBy("_y")
    tx = Window.partitionBy(key_col, "_x")
    ty = Window.partitionBy(key_col, "_y")
    ranked = base.select(
        F.col(key_col),
        (2 * F.rank().over(wx) + F.count("*").over(tx) - 1).alias("_rx2"),
        (2 * F.rank().over(wy) + F.count("*").over(ty) - 1).alias("_ry2"),
    )
    out = paired_stats(ranked, key_col, "_rx2", "_ry2")
    return out.select(
        F.col(key_col),
        "n_rows",
        F.col("corr_xy").alias("spearman_rho"),
    )


def cusum_changepoints(
    counts: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    threshold_sigmas: float = 4.0,
) -> DataFrame:
    """CUSUM changepoint location per key over an ordered integer series
    (Page 1954): where did the level shift, and is the shift significant?

    The classic recursion ``S_i = max(0, S_{i-1} + d_i)`` is not a plain
    window aggregate, but it has an exact closed form over prefix sums:
    ``S+_i = C_i - min_{j<=i} C_j`` (and the down-shift mirror with the
    prefix max), with ``C`` the running sum of deviations. Deviations are
    kept INTEGER by scaling with the per-key count — ``D_i = N * x_i -
    SX`` — so every window aggregate (running sum, running min/max) is
    exact and order-free; the N-division and the sigma comparison are
    terminal FP ops, replayable cross-engine.

    Scale shape: one per-key stats aggregate broadcast back, three
    running windows PARTITIONED BY KEY (never global), one argmax row per
    (key, direction). Returns (key, direction 'up'|'down', peak order
    value, cusum — peak statistic in value units, sigma, flagged).
    """
    stats = counts.groupBy(key_col).agg(
        F.count("*").alias("_n"),
        F.sum(value_col).cast("long").alias("_sx"),
        F.sum(F.col(value_col) * F.col(value_col)).cast("long").alias("_sxx"),
    )
    j = counts.join(F.broadcast(stats), key_col)
    d = F.col("_n") * F.col(value_col) - F.col("_sx")
    run = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = F.sum(d).over(run)
    pref = j.select(
        key_col, order_col, "_n", "_sx", "_sxx", c.alias("_c")
    )
    both = pref.select(
        key_col,
        order_col,
        "_n",
        "_sx",
        "_sxx",
        (F.col("_c") - F.min("_c").over(run)).alias("up"),
        (F.max("_c").over(run) - F.col("_c")).alias("down"),
    )
    sigma = F.sqrt(
        (
            F.col("_n").cast("double") * F.col("_sxx")
            - F.col("_sx").cast("double") * F.col("_sx")
        )
        / (F.col("_n").cast("double") * F.col("_n").cast("double"))
    )
    out = []
    for direction in ("up", "down"):
        rn = F.row_number().over(
            Window.partitionBy(key_col).orderBy(
                F.desc(direction), F.asc(order_col)
            )
        )
        norm = F.col(direction).cast("double") / F.col("_n")
        out.append(
            both.withColumn("_rn", rn)
            .filter(F.col("_rn") == 1)
            .select(
                F.col(key_col),
                F.lit(direction).alias("direction"),
                F.col(order_col).alias("peak_at"),
                F.round(norm, 6).alias("cusum"),
                F.round(sigma, 6).alias("sigma"),
                (norm > threshold_sigmas * sigma).alias("flagged"),
            )
        )
    return out[0].unionByName(out[1])
