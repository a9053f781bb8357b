"""Join strategy helpers for scale (SURVEY.md §2.8: the reference has no
joins; the engine ships the strategies a 100 TB deployment needs).

AQE's skew-join splitting handles most skew automatically; explicit salting
remains necessary when the skewed side feeds a *keyed aggregation* after the
join (AQE can't split those) or when AQE is off. ``skew_salted_join``
implements the classic recipe: explode the small side into ``salt_factor``
replicas, scatter the big side's hot keys uniformly across the replicas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SALT_COL = "_salt"


def skew_salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_factor: int = 8,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with salted keys.

    - big side: each row gets a uniform pseudo-random salt in [0, factor)
      derived from hashing the full row key set (deterministic per row via
      xxhash64 of the join key and a monotonically increasing id would be
      nondeterministic across retries — we hash the key plus all of the big
      side's columns, which is stable for a given input).
    - small side: replicated ``salt_factor`` times (explode), so every
      (key, salt) bucket finds its match.

    The result equals the unsalted join row-for-row; only the shuffle key
    distribution changes (hot keys spread over ``salt_factor`` reducers).

    ``how`` is restricted to modes where that equality actually holds. Each
    BIG row carries exactly one salt, so inner/left-outer/semi/anti from the
    big side are exact. Right- and full-outer are NOT: an unmatched
    small-side row exists once per salt replica and would surface
    ``salt_factor`` null-extended copies — we raise instead of returning
    silently wrong rows (outer-preserve the small side by swapping the
    operands or deduping separately).
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"skew_salted_join: how={how!r} would replicate unmatched "
            f"small-side rows {salt_factor}x; use one of {sorted(allowed)}"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_factor))
    big_salted = big.withColumn(SALT_COL, salt.cast("int"))
    small_salted = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    joined = big_salted.join(small_salted, [on, SALT_COL], how)
    return joined.drop(SALT_COL)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_tiebreak: str | None = None,
    allow_exact: bool = True,
) -> DataFrame:
    """As-of join: attach to each left row the latest right row with
    ``right_ts <= left_ts`` (``<`` when ``allow_exact=False``) for the same
    key. Left rows with no prior right row keep NULLs (left-outer semantics).

    Spark-first plan — the union+window formulation, NOT a range join:
    both sides are unioned (right payload packed into one struct so all its
    fields come from the SAME matched row), then a single window pass per key
    ordered by (ts, side, tiebreak) carries the last non-null right struct
    forward onto each left row. Cost = ONE shuffle on the key + a sort within
    partitions — no per-key explode, no O(left x right) candidate blowup, and
    skew behaves exactly like any keyed window. This is the plan that
    survives 100 TB; a broadcast-range variant only wins when the right side
    fits in memory.

    Ties on ``right_ts`` are broken by ``right_tiebreak`` ascending (the
    LARGEST tiebreak value wins, matching SQL's
    ``ORDER BY ts DESC, tiebreak DESC LIMIT 1``).

    The reference has no joins (SURVEY.md §2.8); this is a scale-path
    extension for event-stream enrichment.
    """
    left_payload = [c for c in left.columns if c not in (on, left_ts)]
    right_payload = [c for c in right.columns if c != on]
    overlap = set(left_payload) & set(right_payload)
    if overlap:
        raise ValueError(f"rename right columns colliding with left: {overlap}")

    # side ordering: with exact matches allowed, a right row at ts==left_ts
    # must sort BEFORE the left row (0 < 1); without, after (2 > 1).
    right_side = 0 if allow_exact else 2
    packed = F.struct(*[F.col(c) for c in right_payload]).alias("_r")

    lu = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        *[F.col(c) for c in left_payload],
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_payload)
            + ">"
        )
        .alias("_r"),
    )
    tie = (
        F.col(right_tiebreak).cast("long")
        if right_tiebreak
        else F.lit(0).cast("long")
    )
    ru = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(right_side).alias("_side"),
        tie.alias("_tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        packed,
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.asc("_ts"), F.asc("_side"), F.asc_nulls_last("_tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lu.unionByName(ru).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == 1).select(
        F.col(on),
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in left_payload],
        *[F.col(f"_match.{c}").alias(c) for c in right_payload],
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 300,
) -> DataFrame:
    """Interval join: point rows matched to every interval of the same key
    with ``start <= ts < end`` — WITHOUT the naive inequality-join plan
    (which Spark executes as a per-key nested loop, O(points x intervals)).

    Bin-and-filter: each point lands in one ``bucket_seconds`` bucket; each
    interval explodes into the buckets it overlaps (bounded fan-out of
    ceil(span/bucket)+1). The join is then a plain EQUI-join on
    (key, bucket) — hash-partitioned, AQE-skew-splittable — followed by the
    exact range predicate. Pick ``bucket_seconds`` ~ the typical interval
    span so fan-out stays 1-2 buckets per interval.
    """
    from ..functions.timeutil import epoch_seconds

    # epoch_seconds handles TIMESTAMP_NTZ columns (bare .cast("long") is
    # illegal on NTZ in Spark 4); bucket math is identical for both flavors.
    pb = points.withColumn(
        "_bucket", F.floor(epoch_seconds(points, ts_col) / bucket_seconds)
    )
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(epoch_seconds(intervals, start_col) / bucket_seconds),
                F.floor(epoch_seconds(intervals, end_col) / bucket_seconds),
            )
        ),
    )
    return (
        pb.join(ib, [on, "_bucket"])
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bucket")
    )


def bloom_build(dim: DataFrame, key: str, bits_log2: int = 20, n_hashes: int = 3) -> DataFrame:
    """Distributed Bloom-filter build over ``dim[key]``: each key sets
    ``n_hashes`` bit positions (xxhash64 with per-hash seeds, mod 2^bits);
    positions pack into 64-bit words via a combinable ``bit_or`` aggregate,
    so the result is a (word_idx, mask) frame of AT MOST 2^bits/64 rows —
    16k rows for 2^20 bits — broadcastable no matter how many keys the
    dimension has. The engine-level twin of Spark's internal runtime
    bloom filter (spark.sql.optimizer.runtime.bloomFilter), exposed so a
    pipeline can apply it across stages/jobs where the optimizer can't.
    """
    m = 1 << bits_log2
    pos = dim.filter(F.col(key).isNotNull()).select(
        F.explode(
            F.array(
                *[
                    (F.abs(F.xxhash64(F.col(key), F.lit(i))) % m).alias(f"h{i}")
                    for i in range(n_hashes)
                ]
            )
        ).alias("bit")
    )
    # PySpark's shiftleft() only takes a literal shift amount; the SQL
    # twin accepts a column, so the bit goes through expr()
    return pos.groupBy((F.col("bit") / 64).cast("long").alias("word_idx")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))")
        ).alias("mask")
    )


def bloom_prune(
    fact: DataFrame,
    key: str,
    bloom: DataFrame,
    bits_log2: int = 20,
    n_hashes: int = 3,
) -> DataFrame:
    """Keep only fact rows whose key MIGHT be in the bloom (all n_hashes
    bits set). False positives pass (the real join discards them); false
    negatives are impossible, so pruning never changes join results — it
    only shrinks the shuffled fact volume by the dimension's selectivity.

    Shape: n_hashes broadcast hash EQUI-joins against the packed word
    frame + a codegen bit test each; NULL keys are dropped (they cannot
    match an equi-join anyway).
    """
    m = 1 << bits_log2
    out = fact.filter(F.col(key).isNotNull())
    for i in range(n_hashes):
        h = F.abs(F.xxhash64(F.col(key), F.lit(i))) % m
        w = bloom.select(
            F.col("word_idx").alias(f"_w{i}"), F.col("mask").alias(f"_m{i}")
        )
        out = (
            out.withColumn(f"_h{i}", h)
            .join(
                F.broadcast(w),
                (F.col(f"_h{i}") / 64).cast("long") == F.col(f"_w{i}"),
            )
            .filter(
                F.expr(
                    f"(shiftright(_m{i}, CAST(_h{i} % 64 AS INT)) & 1) = 1"
                )
            )
            .drop(f"_h{i}", f"_w{i}", f"_m{i}")
        )
    return out


def bloom_filtered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    bits_log2: int = 20,
    n_hashes: int = 3,
) -> DataFrame:
    """Inner equi-join with a Bloom runtime filter applied to the fact side
    FIRST: at 100 TB the win is that non-matching fact rows never enter
    the join shuffle — with a selective dimension the shuffled volume
    drops by orders of magnitude for the cost of a ≤(2^bits/64)-row
    broadcast. Result is EXACTLY fact ⋈ dim (no false negatives; false
    positives die in the join)."""
    bloom = bloom_build(dim, dim_key, bits_log2, n_hashes)
    pruned = bloom_prune(fact, fact_key, bloom, bits_log2, n_hashes)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])


def choose_salt_factor(
    df: DataFrame,
    on: str,
    target_rows_per_task: int = 1_000_000,
    stats: dict | None = None,
) -> int:
    """Measure, don't guess: pick ``skew_salted_join``'s factor from the
    DATA — the adaptive-routing discipline of ``choose_ngram_strategy``
    applied to join skew.

    One exact aggregate finds the hottest key's row count (map-side
    combined: the shuffle carries one partial count per key per task —
    this probe is deliberately run on the UNSALTED key distribution the
    join would shuffle). The factor is
    ``ceil(hottest / target_rows_per_task)``: just enough replicas that
    the hottest key's slices fit a task, and exactly 1 (no salting, no
    small-side replication cost) when nothing is hot. Pass ``stats`` to
    capture the evidence ({hottest_key, hottest_count, factor}) for the
    run log."""
    top = (
        df.groupBy(on)
        .agg(F.count("*").alias("_n"))
        .orderBy(F.desc("_n"), F.asc(on))
        .limit(1)
        .collect()
    )
    if not top:
        factor = 1
        if stats is not None:
            stats.update(hottest_key=None, hottest_count=0, factor=1)
        return factor
    hottest, count = top[0][on], top[0]["_n"]
    factor = max(1, -(-count // target_rows_per_task))  # ceil div
    if stats is not None:
        stats.update(hottest_key=hottest, hottest_count=count, factor=factor)
    return factor


def choose_join_strategy(
    dim: DataFrame,
    broadcast_threshold_rows: int = 1_000_000,
    stats: dict | None = None,
) -> str:
    """Measure, don't guess — the broadcast decision as data: ONE exact
    count of the dimension (map-side-combined, no payload shuffle)
    decides ``"broadcast"`` vs ``"shuffle"`` against a row threshold
    sized to executor memory. Complements ``choose_salt_factor`` (skew)
    and ``join_size_estimate_cms`` (output size) as the third
    measured-planning primitive; AQE re-plans sizes at runtime, but a
    pipeline choosing a strategy ACROSS jobs (e.g. publishing a
    broadcastable sidecar) needs the decision ahead of time."""
    n = dim.count()
    strategy = "broadcast" if n <= broadcast_threshold_rows else "shuffle"
    if stats is not None:
        stats.update(dim_rows=n, threshold=broadcast_threshold_rows,
                     strategy=strategy)
    return strategy


def strategy_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    broadcast_threshold_rows: int = 1_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """Inner equi-join with the measured strategy applied: broadcast
    hint when the dimension fits, plain shuffle join otherwise. Result
    rows are identical either way — only the physical plan changes."""
    if choose_join_strategy(dim, broadcast_threshold_rows, stats) == "broadcast":
        return fact.join(F.broadcast(dim), on)
    return fact.join(dim, on)

