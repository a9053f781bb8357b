"""Window-function operators (SURVEY.md §2.7 W1 + the analytic surface the
reference leaves implicit but the engine exposes)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order: list[Column],
    k: int = 1,
    rank_col: str = "rank",
) -> DataFrame:
    """W1 (Consumer.scala:106-124, the disabled ``query3``): top-k rows per
    group via ``row_number`` over a partitioned window, filter rank<=k, drop
    the rank.

    Pass a total ``order`` (include a tiebreaker) for deterministic output.
    At scale this is one shuffle on ``partition_cols``; skewed groups are
    split by AQE skew handling since each group's sort is bounded by the
    partition.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
        .drop(rank_col)
    )


def range_partitioned_ntile(
    df: DataFrame,
    n: int,
    order: list[Column],
    partition_cols: list[str] | None = None,
    out_col: str = "tile",
    max_sidecar_rows: int = 100_000,
) -> DataFrame:
    """EXACT ``ntile(n)`` without a single-partition global sort.

    ``Window.orderBy(...)`` with no partition key funnels every row through
    ONE task (Spark warns ``No Partition Defined``) — the shape that turns a
    10^9-row rank into a single-executor job. This operator computes the
    identical bucket assignment scale-safely:

    1. ``repartitionByRange`` on (partition_cols + order): each task holds a
       contiguous slice of the global (or per-group) order.
    2. One bounded aggregate counts rows per (group, slice); the counts —
       at most ``P + groups_spanning_boundaries`` rows — come to the driver
       to fold slice offsets and group totals (the same bounded-sidecar
       coordination as the k-means/IVF fits).
    3. Offsets broadcast-join back; ``row_number`` over the (group, slice)-
       partitioned window + offset = the exact global rank; the standard
       ntile arithmetic (first ``n_rows mod n`` buckets get the extra row)
       maps rank -> bucket.

    ``order`` must be a TOTAL order (include a tiebreaker): ties spanning a
    range boundary would otherwise make ranks partition-dependent — the
    same determinism contract as ``ntile`` itself needs for oracle parity.

    CARDINALITY BOUND (VERDICT r5 #4): the slice-count sidecar is
    O(partitions + distinct partition_cols groups) — fine for the current
    uses (25 nations / global) and any dashboard-grade grouping, but a
    HIGH-cardinality group column (millions of groups) would funnel one
    sidecar row per group through the driver. The collect is therefore
    capped at ``max_sidecar_rows`` and raises loudly past it; for such
    shapes use a plain per-group ``Window.partitionBy(groups).orderBy``
    ntile instead — with many small groups the per-group window is the
    scale-safe plan (no group funnels one task), and this operator's
    driver coordination buys nothing.

    Matches ``ntile`` bit-for-bit (property-tested vs ``Window.orderBy``
    at every n/partitioning), so DuckDB ``ntile`` oracles stay valid.

    The post-``repartitionByRange`` frame is PERSISTED (r11 ADVICE, low —
    same structural guarantee as ``range_partitioned_running_sum``): the
    sidecar collect and the caller's final query are two separate jobs
    and range-boundary sampling re-runs per job, so without the pin a
    boundary row could change slices between them and corrupt the exact
    offsets. Cache lifetime: the persisted frame backs the RETURNED lazy
    plan and cannot be released in-function; the bench harness / driver
    sim clearCache between queries.
    """
    parts = list(partition_cols or [])
    sliced = df.repartitionByRange(*parts, *order).withColumn(
        "_slice", F.spark_partition_id()
    ).persist()
    counts = (
        sliced.groupBy(*parts, "_slice")
        .count()
        .limit(max_sidecar_rows + 1)
        .collect()
    )  # bounded: contiguous slices -> ~P + #groups rows
    if len(counts) > max_sidecar_rows:
        raise ValueError(
            f"range_partitioned_ntile sidecar exceeds {max_sidecar_rows} "
            "(group, slice) rows — partition_cols cardinality is too high "
            "for driver-side offset folding; use "
            "Window.partitionBy(*partition_cols).orderBy(*order) with "
            "ntile directly (scale-safe when groups are many and small)"
        )
    key = lambda r: tuple(r[c] for c in parts)
    by_group: dict[tuple, list] = {}
    for r in sorted(counts, key=lambda r: r["_slice"]):
        by_group.setdefault(key(r), []).append(r)
    lookup_rows = []
    for rows in by_group.values():
        total = sum(r["count"] for r in rows)
        offset = 0
        for r in rows:
            lookup_rows.append(
                tuple(r[c] for c in parts) + (r["_slice"], offset, total)
            )
            offset += r["count"]
    from pyspark.sql import types as T

    part_fields = [] if not parts else list(df.select(*parts).schema.fields)
    schema = T.StructType(
        part_fields
        + [
            T.StructField("_slice", T.IntegerType(), False),
            T.StructField("_offset", T.LongType(), False),
            T.StructField("_n_rows", T.LongType(), False),
        ]
    )
    lookup = df.sparkSession.createDataFrame(lookup_rows, schema)
    w = Window.partitionBy(*parts, "_slice").orderBy(*order)
    rank = (F.row_number().over(w) + F.col("_offset")).cast("long")
    q = (F.col("_n_rows") / n).cast("long")  # floor: both operands >= 0
    rem = F.col("_n_rows") % n
    threshold = rem * (q + 1)
    tile = F.when(
        rank <= threshold, ((rank - 1) / (q + 1)).cast("long") + 1
    ).otherwise(rem + ((rank - threshold - 1) / q).cast("long") + 1)
    return (
        sliced.join(F.broadcast(lookup), parts + ["_slice"])
        .withColumn(out_col, tile.cast("int"))
        .drop("_slice", "_offset", "_n_rows")
    )


def range_partitioned_ntiles(
    df: DataFrame,
    specs: list[tuple[int, list[Column], str]],
    key_cols: list[str],
    max_sidecar_rows: int = 100_000,
) -> DataFrame:
    """SEVERAL exact global ``ntile`` columns over the same frame with ONE
    bounded sidecar action (guide §2.6 — r14: chaining
    ``range_partitioned_ntile`` once per axis runs one EAGER sidecar
    collect per axis, serialized; rfm_segments paid 3). ``specs`` is
    ``[(n, order, out_col), ...]``; each order must be TOTAL (same
    contract as the single-spec operator) and ``key_cols`` must uniquely
    identify rows (the tile frames re-join on them). Returns one row per
    input row with ``key_cols`` + every ``out_col`` — bit-identical tile values to
    the chained form, because each tile depends only on ``df`` and its
    own order (the chained form merely carries earlier tile columns
    along; it never feeds them into later orders).

    Shape: one ``repartitionByRange`` per spec (persisted — same
    structural slice-pinning guarantee as the single-spec operator), the
    per-slice counts of ALL specs unioned into ONE collect, offsets fold
    driver-side per spec, and the tile frames join back on ``key_cols``
    (skinny: keys + one int each). No global single-task window
    anywhere; the sidecar stays O(specs * partitions).

    Cache lifetime: each persisted sliced frame backs the RETURNED lazy
    plan and cannot be released in-function; the bench harness / driver
    sim clearCache between queries (same contract as the single-spec
    operators).
    """
    sliceds = [
        df.repartitionByRange(*order)
        .withColumn("_slice", F.spark_partition_id())
        .persist()
        for _n, order, _out in specs
    ]
    counts_union = None
    for i, sliced in enumerate(sliceds):
        branch = (
            sliced.groupBy("_slice")
            .count()
            .limit(max_sidecar_rows + 1)
            .select(
                F.lit(i).alias("_spec"), "_slice", F.col("count").alias("_v")
            )
        )
        counts_union = (
            branch if counts_union is None else counts_union.unionByName(branch)
        )
    rows = counts_union.collect()  # ONE action for every spec's sidecar
    by_spec: dict[int, list] = {}
    for r in rows:
        by_spec.setdefault(r["_spec"], []).append(r)
    from pyspark.sql import types as T

    out: DataFrame | None = None
    for i, (n, order, out_col) in enumerate(specs):
        spec_rows = sorted(by_spec.get(i, []), key=lambda r: r["_slice"])
        if len(spec_rows) > max_sidecar_rows:
            raise ValueError(
                f"range_partitioned_ntiles sidecar for spec {i} exceeds "
                f"{max_sidecar_rows} slice rows"
            )
        total = sum(r["_v"] for r in spec_rows)
        lookup_rows = []
        offset = 0
        for r in spec_rows:
            lookup_rows.append((r["_slice"], offset, total))
            offset += r["_v"]
        schema = T.StructType(
            [
                T.StructField("_slice", T.IntegerType(), False),
                T.StructField("_offset", T.LongType(), False),
                T.StructField("_n_rows", T.LongType(), False),
            ]
        )
        lookup = df.sparkSession.createDataFrame(lookup_rows, schema)
        w = Window.partitionBy("_slice").orderBy(*order)
        rank = (F.row_number().over(w) + F.col("_offset")).cast("long")
        q = (F.col("_n_rows") / n).cast("long")
        rem = F.col("_n_rows") % n
        threshold = rem * (q + 1)
        tile = F.when(
            rank <= threshold, ((rank - 1) / (q + 1)).cast("long") + 1
        ).otherwise(rem + ((rank - threshold - 1) / q).cast("long") + 1)
        tiles = (
            sliceds[i]
            .join(F.broadcast(lookup), "_slice")
            .select(*key_cols, tile.cast("int").alias(out_col))
        )
        out = tiles if out is None else out.join(tiles, key_cols)
    assert out is not None, "specs must be non-empty"
    return out


def range_partitioned_running_sum_batch(
    inputs: list[tuple[DataFrame, list[Column], str]],
    prefix: str = "running_",
    max_sidecar_rows: int = 100_000,
) -> list[DataFrame]:
    """Batch form of :func:`range_partitioned_running_sum` for several
    independent (frame, order, value_col) passes with NO partition_cols:
    all bounded sidecar aggregates are fetched in ONE Spark action
    (guide §2.6 — r14: sorted_neighborhood_pairs ran one serialized
    sidecar collect per sort key). Per-pass output is identical to
    ``range_partitioned_running_sum(df, order, [value_col])``: input
    columns pass through plus ``{prefix}{value_col}``.

    Same structural guarantees as the single-pass operator: each
    post-``repartitionByRange`` frame is persisted before the sidecar
    action so slice assignments are pinned across the sidecar job and
    the caller's final job; the per-pass sidecar stays bounded by
    ``max_sidecar_rows`` with the same loud failure.

    Cache lifetime: each persisted sliced frame backs its RETURNED lazy
    plan and cannot be released in-function; the bench harness / driver
    sim clearCache between queries (same contract as the single-pass
    operator).
    """
    sliceds = [
        df.repartitionByRange(*order)
        .withColumn("_slice", F.spark_partition_id())
        .persist()
        for df, order, _vc in inputs
    ]
    counts_union = None
    for i, (sliced, (_df, _order, vc)) in enumerate(zip(sliceds, inputs)):
        branch = (
            sliced.groupBy("_slice")
            .agg(F.sum(vc).alias("_v"))
            .limit(max_sidecar_rows + 1)
            .select(F.lit(i).alias("_spec"), "_slice", "_v")
        )
        counts_union = (
            branch if counts_union is None else counts_union.unionByName(branch)
        )
    rows = counts_union.collect()  # ONE action for every pass's sidecar
    by_spec: dict[int, list] = {}
    for r in rows:
        by_spec.setdefault(r["_spec"], []).append(r)
    from pyspark.sql import types as T

    outs: list[DataFrame] = []
    for i, (df, order, vc) in enumerate(inputs):
        spec_rows = sorted(by_spec.get(i, []), key=lambda r: r["_slice"])
        if len(spec_rows) > max_sidecar_rows:
            raise ValueError(
                f"range_partitioned_running_sum_batch sidecar for pass {i} "
                f"exceeds {max_sidecar_rows} slice rows"
            )
        lookup_rows = []
        offset = 0
        for r in spec_rows:
            lookup_rows.append((r["_slice"], offset))
            offset += r["_v"] or 0
        schema = T.StructType(
            [
                T.StructField("_slice", T.IntegerType(), False),
                T.StructField(f"_off_{vc}", T.LongType(), False),
            ]
        )
        lookup = df.sparkSession.createDataFrame(lookup_rows, schema)
        w = (
            Window.partitionBy("_slice")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        outs.append(
            sliceds[i]
            .join(F.broadcast(lookup), "_slice")
            .withColumn(
                f"{prefix}{vc}",
                (F.sum(vc).over(w) + F.col(f"_off_{vc}")).cast("long"),
            )
            .drop("_slice", f"_off_{vc}")
        )
    return outs


def range_partitioned_running_sum(
    df: DataFrame,
    order: list[Column],
    value_cols: list[str],
    partition_cols: list[str] | None = None,
    prefix: str = "running_",
    max_sidecar_rows: int = 100_000,
) -> DataFrame:
    """EXACT inclusive running sums of ``value_cols`` in ``order`` without
    a single-partition global window — the generalization of
    ``range_partitioned_ntile``'s rework (VERDICT r4) to arbitrary
    prefix aggregation (cumulative counts, Pareto curves, rank sums,
    CDF-style statistics).

    Same coordination recipe: (1) ``repartitionByRange`` on
    (partition_cols + order) so each task holds a contiguous slice of the
    (per-group) order; (2) ONE bounded aggregate sums each value column
    per (group, slice) — O(partitions + groups) sidecar rows fold to
    per-slice offsets driver-side (the same bounded-sidecar pattern and
    the same ``max_sidecar_rows`` loud-failure guard); (3) offsets
    broadcast back and an intra-slice window (partitioned by slice —
    never global) adds the local prefix.

    ``order`` must be a TOTAL order (include a tiebreaker): the running
    value at a tie would otherwise be partition-dependent. Output adds
    ``{prefix}{col}`` per value column; input columns pass through.

    The post-``repartitionByRange`` frame is PERSISTED (r11 ADVICE, low):
    the sidecar collect and the caller's final query are two separate
    Spark jobs, and range-boundary sampling re-runs per job (sampler seed
    is tied to the RDD id), so with a sub-sampled key set a row near a
    boundary could land in different slices across the two jobs and
    silently corrupt the exact offsets. Persisting ``sliced`` (which the
    sidecar aggregate fully materializes) pins one set of slice
    assignments for both jobs — the guarantee is structural, not
    scale-dependent. Cache lifetime: the persisted frame backs the
    RETURNED lazy plan and cannot be released in-function; the bench
    harness / driver sim clearCache between queries.
    """
    parts = list(partition_cols or [])
    sliced = df.repartitionByRange(*parts, *order).withColumn(
        "_slice", F.spark_partition_id()
    ).persist()
    counts = (
        sliced.groupBy(*parts, "_slice")
        .agg(*[F.sum(c).alias(c) for c in value_cols])
        .limit(max_sidecar_rows + 1)
        .collect()
    )
    if len(counts) > max_sidecar_rows:
        raise ValueError(
            f"range_partitioned_running_sum sidecar exceeds "
            f"{max_sidecar_rows} (group, slice) rows — partition_cols "
            "cardinality is too high for driver-side offset folding; use "
            "a Window.partitionBy(*partition_cols) running sum directly "
            "(scale-safe when groups are many and small)"
        )
    key = lambda r: tuple(r[c] for c in parts)
    by_group: dict[tuple, list] = {}
    for r in sorted(counts, key=lambda r: r["_slice"]):
        by_group.setdefault(key(r), []).append(r)
    lookup_rows = []
    for rows in by_group.values():
        offsets = [0] * len(value_cols)
        for r in rows:
            lookup_rows.append(
                tuple(r[c] for c in parts)
                + (r["_slice"],)
                + tuple(offsets)
            )
            for i, c in enumerate(value_cols):
                offsets[i] += r[c] or 0
    from pyspark.sql import types as T

    part_fields = [] if not parts else list(df.select(*parts).schema.fields)
    schema = T.StructType(
        part_fields
        + [T.StructField("_slice", T.IntegerType(), False)]
        + [
            T.StructField(f"_off_{c}", T.LongType(), False)
            for c in value_cols
        ]
    )
    lookup = df.sparkSession.createDataFrame(lookup_rows, schema)
    w = (
        Window.partitionBy(*parts, "_slice")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = sliced.join(F.broadcast(lookup), parts + ["_slice"])
    for c in value_cols:
        out = out.withColumn(
            f"{prefix}{c}",
            (F.sum(c).over(w) + F.col(f"_off_{c}")).cast("long"),
        )
    return out.drop("_slice", *[f"_off_{c}" for c in value_cols])


def sharded_top_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order: list[Column],
    k: int = 1,
    shards: int = 32,
    shard_key: Column | None = None,
) -> DataFrame:
    """Exact top-k per group for EXTREME group cardinalities — the
    two-phase answer to ``top_per_group``'s one giant window partition
    per group (a handful of labels over a 10M-row vocab each would sort
    10M rows in one task; see nb_lang_top_features' stated bound).

    Phase 1 splits every group into ``shards`` deterministic sub-groups
    (``pmod(xxhash64(shard_key), shards)``; default shard key = the
    first order column) and takes top-k within each (group, shard) —
    parallelism is groups x shards, each sort bounded by its shard.
    Phase 2 re-ranks the <= shards*k survivors per group with the SAME
    order — a window whose partitions are k*shards rows by construction.

    With a TOTAL ``order`` the result is bit-identical to
    ``top_per_group`` (pinned by pytest): shard assignment can never
    change WHICH rows are top-k, only where their phase-1 rank was
    computed — any row in the true global top-k is necessarily in its
    own shard's top-k.
    """
    key = shard_key if shard_key is not None else order[0]
    sharded = df.withColumn(
        "_shard", F.pmod(F.xxhash64(key), F.lit(shards))
    )
    w1 = Window.partitionBy(*partition_cols, "_shard").orderBy(*order)
    survivors = (
        sharded.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_shard")
    )
    w2 = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        survivors.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
        .drop("_r2")
    )


def range_partitioned_running_max(
    df: DataFrame,
    order: list[Column],
    value_cols: list[str],
    partition_cols: list[str] | None = None,
    prefix: str = "runmax_",
    max_sidecar_rows: int = 100_000,
) -> DataFrame:
    """EXACT inclusive running MAX in ``order`` without a single-
    partition global window — the MAX-monoid member of the range-
    partitioned prefix family (sum: ``range_partitioned_running_sum``;
    ntile: ``range_partitioned_ntile``). Same recipe: range-partition on
    the order, one bounded per-(group, slice) max sidecar folded to
    prefix offsets driver-side, offsets broadcast back, and
    ``greatest(intra-slice running max, offset)`` — the offset for the
    first slice is NULL and ``greatest`` skips it (the max identity).

    ``value_cols`` must be BIGINT-compatible (cast timestamps to epoch
    seconds first). ``order`` must be total for deterministic output.

    The post-``repartitionByRange`` frame is PERSISTED (r11 ADVICE, low —
    same structural guarantee as ``range_partitioned_running_sum``): the
    sidecar collect and the caller's final query are two separate jobs
    and range-boundary sampling re-runs per job, so without the pin a
    boundary row could change slices between them and corrupt the exact
    offsets. Cache lifetime: the persisted frame backs the RETURNED lazy
    plan and cannot be released in-function; the bench harness / driver
    sim clearCache between queries.
    """
    parts = list(partition_cols or [])
    sliced = df.repartitionByRange(*parts, *order).withColumn(
        "_slice", F.spark_partition_id()
    ).persist()
    counts = (
        sliced.groupBy(*parts, "_slice")
        .agg(*[F.max(c).alias(c) for c in value_cols])
        .limit(max_sidecar_rows + 1)
        .collect()
    )
    if len(counts) > max_sidecar_rows:
        raise ValueError(
            f"range_partitioned_running_max sidecar exceeds "
            f"{max_sidecar_rows} (group, slice) rows — partition_cols "
            "cardinality is too high for driver-side offset folding; use "
            "a Window.partitionBy(*partition_cols) running max directly"
        )
    key = lambda r: tuple(r[c] for c in parts)
    by_group: dict[tuple, list] = {}
    for r in sorted(counts, key=lambda r: r["_slice"]):
        by_group.setdefault(key(r), []).append(r)
    lookup_rows = []
    for rows in by_group.values():
        prev: list = [None] * len(value_cols)
        for r in rows:
            lookup_rows.append(
                tuple(r[c] for c in parts) + (r["_slice"],) + tuple(prev)
            )
            for i, c in enumerate(value_cols):
                v = r[c]
                if v is not None and (prev[i] is None or v > prev[i]):
                    prev[i] = v
    from pyspark.sql import types as T

    part_fields = [] if not parts else list(df.select(*parts).schema.fields)
    schema = T.StructType(
        part_fields
        + [T.StructField("_slice", T.IntegerType(), False)]
        + [
            T.StructField(f"_off_{c}", T.LongType(), True)
            for c in value_cols
        ]
    )
    lookup = df.sparkSession.createDataFrame(lookup_rows, schema)
    w = (
        Window.partitionBy(*parts, "_slice")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = sliced.join(F.broadcast(lookup), parts + ["_slice"])
    for c in value_cols:
        out = out.withColumn(
            f"{prefix}{c}",
            F.greatest(F.max(c).over(w), F.col(f"_off_{c}")).cast("long"),
        )
    return out.drop("_slice", *[f"_off_{c}" for c in value_cols])


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    minimize_x: bool = True,
    maximize_y: bool = True,
) -> DataFrame:
    """The 2-D skyline (Pareto-optimal set): rows no other row beats on
    both dimensions (x lower-is-better, y higher-is-better by default;
    flip with the flags — internally both reduce to min-x/max-y by
    negation). Equal points do not strictly dominate each other, so
    exact duplicates of a skyline point all survive.

    Scale shape — never the O(n^2) nested loop: (1) one keyed aggregate
    folds the corpus to DISTINCT x values with their best y; (2) the
    range-partitioned running max gives each x the best y over all
    better-or-equal x; (3) an x survives iff its own best y achieves
    that prefix max AND it is the FIRST x to reach that value (the
    first-owner pattern — a later x re-achieving the same y is
    dominated on x); (4) survivors broadcast back to pick the actual
    rows. Everything is aggregates + the bounded-sidecar prefix max —
    no self-join, no global single-task window.
    """
    sx = F.col(x_col) if minimize_x else -F.col(x_col)
    sy = F.col(y_col) if maximize_y else -F.col(y_col)
    pts = df.withColumn("_sx", sx).withColumn("_sy", sy)
    per_x = pts.groupBy("_sx").agg(F.max("_sy").alias("_mx"))
    rm = range_partitioned_running_max(
        per_x, order=[F.asc("_sx")], value_cols=["_mx"]
    )
    frontier = (
        rm.filter(F.col("_mx") == F.col("runmax__mx"))
        .groupBy("_mx")
        .agg(F.min("_sx").alias("_sx"))
        .select("_sx", "_mx")
    )
    return (
        pts.join(
            F.broadcast(frontier),
            (pts["_sx"] == frontier["_sx"]) & (pts["_sy"] == frontier["_mx"]),
        )
        .drop("_sx", "_mx", "_sy")
    )
