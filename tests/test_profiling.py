"""Operator tests for profiling (histogram/skew) and mixture replication."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_project_spark.operators.profiling import (
    bucketize,
    numeric_histogram,
    skew_profile,
)
from spark_streaming_project_spark.operators.sampling import mixture_epochs


def test_bucketize_clamps_and_propagates_null(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (4.9,), (5.0,), (49.9,), (99.0,), (None,)], ["x"]
    )
    got = [
        r["b"]
        for r in df.select(bucketize("x", 0.0, 50.0, 10).alias("b")).collect()
    ]
    # width 5: -5 clamps to 0, 5.0 lands in bucket 1, 99 clamps to 9
    assert got == [0, 0, 0, 1, 9, 9, None]


def test_numeric_histogram_counts_cover_all_rows(spark):
    df = spark.range(1000).select((F.col("id") % 50 + 1).alias("v"))
    hist = numeric_histogram(df, "v", 1.0, 51.0, 10).collect()
    assert sum(r["row_count"] for r in hist) == 1000
    assert len(hist) == 10
    for r in hist:
        # per-bucket min/max must sit inside the bucket's edges
        assert r["lo_edge"] <= r["min_val"] <= r["max_val"] < r["lo_edge"] + 5.0


def test_skew_profile_shares_and_order(spark):
    # one key owns 90% of rows
    df = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id"))
        ).alias("k")
    )
    prof = skew_profile(df, "k", k=5).collect()
    assert prof[0]["k"] == "hot"
    assert prof[0]["key_count"] == 900
    assert prof[0]["total_rows"] == 1000
    assert abs(prof[0]["share"] - 0.9) < 1e-9
    assert len(prof) == 5


def test_mixture_epochs_replication(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c")], ["id", "src"]
    )
    out = mixture_epochs(df, "src", {"a": 3, "b": 0}, default_epochs=2).collect()
    by_id: dict[int, list[int]] = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r["epoch"])
    assert sorted(by_id[1]) == [1, 2, 3]
    assert sorted(by_id[2]) == [1, 2, 3]
    assert 3 not in by_id  # 0 epochs -> dropped
    assert sorted(by_id[4]) == [1, 2]


def test_cusum_locates_injected_level_shift(spark):
    """A series that steps from 10 to 20 at t=50: the down-CUSUM peaks at
    the last low point (t=49, where the prefix sum bottoms out) and the
    up-CUSUM at the series end (maximum recovery from that minimum), both
    flagged, with the peak statistic exactly 50 * |deviation| / 1; a flat
    series is never flagged and its normalized peak is 0."""
    from spark_streaming_project_spark.operators.profiling import (
        cusum_changepoints,
    )

    shifted = [("k", t, 10) for t in range(50)] + [
        ("k", t, 20) for t in range(50, 100)
    ]
    flat = [("f", t, 7) for t in range(100)]
    df = spark.createDataFrame(
        shifted + flat, "key string, t long, v long"
    )
    got = {
        (r["key"], r["direction"]): r
        for r in cusum_changepoints(df, "key", "t", "v").collect()
    }
    up = got[("k", "up")]
    # mean is 15; deviations are -5 before, +5 after: the reflected
    # up-CUSUM peaks at the LAST point (cumsum recovers from its minimum
    # at t=49 and climbs to the end), and the down-CUSUM peaks at t=49
    down = got[("k", "down")]
    assert down["peak_at"] == 49
    assert up["peak_at"] == 99
    assert up["flagged"] and down["flagged"]
    assert abs(up["cusum"] - 250.0) < 1e-6  # 50 * |±5|
    assert got[("f", "up")]["cusum"] == 0.0
    assert not got[("f", "up")]["flagged"]
    assert not got[("f", "down")]["flagged"]


def test_hll_union_overlap_inclusion_exclusion_sanity(spark):
    """Union register max == sketch of concatenation (monoid), so the
    union estimate equals the estimate of the concatenated values, and
    inclusion-exclusion overlap is bounded by the single-set estimates."""
    from pyspark.sql import functions as F

    from spark_streaming_project_spark.operators.sketches import (
        hll_build,
        hll_estimate,
        hll_merge,
    )

    a = spark.createDataFrame(
        [(f"v{i}",) for i in range(200)], "val string"
    )
    b = spark.createDataFrame(
        [(f"v{i}",) for i in range(100, 300)], "val string"
    )
    ra, rb = hll_build(a, "val"), hll_build(b, "val")
    merged = hll_merge(ra, rb, [])
    est_union = hll_estimate(merged).first()["distinct_estimate"]
    est_concat = hll_estimate(
        hll_build(a.unionByName(b), "val")
    ).first()["distinct_estimate"]
    assert est_union == est_concat  # exact monoid merge, not approximate
    ea = hll_estimate(ra).first()["distinct_estimate"]
    eb = hll_estimate(rb).first()["distinct_estimate"]
    overlap = max(0.0, ea + eb - est_union)
    # true overlap is 100 of 300; sketch overlap must be positive and
    # below each single-set estimate
    assert 0 < overlap < min(ea, eb)


def test_sliding_window_sketch_merge_equals_direct_build(spark):
    """The sliding_distinct_sketch contract at register level: merging the
    per-hour HLL register frames of hours [h, h+2] yields EXACTLY the
    register frame of an hll_build over the raw 3-hour slice — so window
    widening is a sketch merge, never a re-scan."""
    from spark_streaming_project_spark.operators.sketches import hll_build
    from spark_streaming_project_spark.sources.batch import load_table

    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .filter(F.col("user_id").isNotNull())
        .withColumn("h", F.date_trunc("hour", F.col("ts")))
    )
    h0 = ev.agg(F.min("h")).collect()[0][0]
    in_window = ev.filter(
        (F.col("h") >= F.lit(h0))
        & (F.col("h") < F.lit(h0) + F.expr("INTERVAL 3 HOUR"))
    )
    direct = {
        (r["bucket"], r["max_rho"])
        for r in hll_build(in_window, "user_id", m=64).collect()
    }
    hourly = hll_build(in_window, "user_id", ["h"], m=64)
    merged = {
        (r["bucket"], r["max_rho"])
        for r in hourly.groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
        .collect()
    }
    assert merged == direct and len(direct) > 0
