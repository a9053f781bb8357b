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
