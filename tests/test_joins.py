"""Skew-salted join equivalence: the salted plan must return exactly the
rows of the plain join, under heavy key skew."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_project_spark.operators.joins import skew_salted_join


def test_salted_join_equals_plain_join(spark):
    # 100k-row big side, 90% of rows on one hot key
    big = spark.range(100_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim_val")
    )
    plain = big.join(small, "k").select("k", "payload", "dim_val")
    salted = skew_salted_join(big, small, "k").select("k", "payload", "dim_val")
    assert plain.count() == salted.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_outer(spark):
    big = spark.range(1000).select((F.col("id") % 60).alias("k"), F.col("id").alias("v"))
    small = spark.range(50).select(F.col("id").alias("k"), F.lit("d").alias("d"))
    plain = big.join(small, "k", "left").select("k", "v", "d")
    salted = skew_salted_join(big, small, "k", "left").select("k", "v", "d")
    assert plain.count() == salted.count()
    assert salted.exceptAll(plain).count() == 0


def test_asof_join_matches_naive_window_plan(spark):
    from spark_streaming_project_spark.operators.joins import asof_join
    from pyspark.sql import Window

    # deterministic pseudo-random event data with duplicate timestamps
    left = spark.range(500).select(
        (F.col("id") % 37).alias("k"),
        (F.xxhash64("id") % 1000).alias("lts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(300).select(
        (F.col("id") % 37).alias("k"),
        (F.xxhash64("id", F.lit(1)) % 500).alias("rts"),
        F.col("id").alias("rid"),
        (F.col("id") * 2).alias("rval"),
    )
    got = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", right_tiebreak="rid"
    )
    # naive twin: inequality join + row_number argmax
    j = left.join(right, "k", "left").withColumn(
        "_ok", F.col("rts") <= F.col("lts")
    )
    w = Window.partitionBy("k", "lid").orderBy(
        F.desc("_ok"), F.desc("rts"), F.desc("rid")
    )
    naive = (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "k", "lts", "lid",
            F.when(F.col("_ok"), F.col("rts")).alias("rts"),
            F.when(F.col("_ok"), F.col("rid")).alias("rid"),
            F.when(F.col("_ok"), F.col("rval")).alias("rval"),
        )
    )
    assert got.count() == left.count()
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_asof_join_exact_match_toggle(spark):
    from spark_streaming_project_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 100, "L")], "k int, lts int, lv string")
    right = spark.createDataFrame(
        [(1, 100, "exact"), (1, 50, "earlier")], "k int, rts int, rv string"
    )
    with_exact = asof_join(left, right, "k", "lts", "rts").collect()[0]
    assert with_exact["rv"] == "exact"
    without = asof_join(left, right, "k", "lts", "rts", allow_exact=False).collect()[0]
    assert without["rv"] == "earlier"


def test_range_join_binned_matches_inequality_join(spark):
    from spark_streaming_project_spark.operators.joins import range_join_binned

    points = spark.range(2000).select(
        (F.col("id") % 23).alias("k"),
        F.timestamp_seconds(F.pmod(F.xxhash64("id"), F.lit(100_000))).alias("pts"),
    )
    intervals = spark.range(200).select(
        (F.col("id") % 23).alias("k"),
        F.col("id").alias("iid"),
        F.timestamp_seconds(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(90_000))).alias("s"),
    ).withColumn("e", F.col("s") + F.expr("INTERVAL 2 HOURS"))
    got = range_join_binned(points, intervals, "k", "pts", "s", "e", bucket_seconds=3600)
    naive = points.join(intervals, "k").filter(
        (F.col("pts") >= F.col("s")) & (F.col("pts") < F.col("e"))
    )
    assert got.count() == naive.count() > 0
    assert got.select(*sorted(got.columns)).exceptAll(
        naive.select(*sorted(got.columns))
    ).count() == 0


def test_salted_join_rejects_outer_modes(spark):
    # right/full outer would surface each unmatched small-side row once per
    # salt replica — the helper must refuse rather than multiply rows.
    import pytest

    big = spark.range(10).select((F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    small = spark.range(5).select(F.col("id").alias("k"), F.lit("d").alias("d"))
    for how in ("right", "right_outer", "full", "full_outer", "outer", "cross"):
        with pytest.raises(ValueError, match="skew_salted_join"):
            skew_salted_join(big, small, "k", how)


def test_salted_join_semi_anti(spark):
    big = spark.range(1000).select((F.col("id") % 60).alias("k"), F.col("id").alias("v"))
    small = spark.range(50).select(F.col("id").alias("k"), F.lit("d").alias("d"))
    for how in ("left_semi", "left_anti"):
        plain = big.join(small, "k", how).select("k", "v")
        salted = skew_salted_join(big, small, "k", how).select("k", "v")
        assert plain.count() == salted.count()
        assert salted.exceptAll(plain).count() == 0


def test_bloom_prune_no_false_negatives_and_selective(spark):
    """Every true match must survive pruning (bloom has no false
    negatives); with a selective dim the pruned fact must be much smaller
    than the full fact; the filtered join must equal the plain join."""
    from spark_streaming_project_spark.operators.joins import (
        bloom_build,
        bloom_filtered_join,
        bloom_prune,
    )
    from spark_streaming_project_spark.sources.batch import load_table

    from .conftest import SF_CORRECT

    orders = load_table(spark, SF_CORRECT, "orders")
    cust = load_table(spark, SF_CORRECT, "customer").filter(
        F.col("c_acctbal") < -900  # selective dimension slice
    )
    assert 0 < cust.count() < 100

    bloom = bloom_build(cust, "c_custkey")
    pruned = bloom_prune(orders, "o_custkey", bloom)

    true_matches = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_semi"
    )
    n_true, n_pruned, n_all = true_matches.count(), pruned.count(), orders.count()
    # no false negatives: every matching order survived
    assert n_pruned >= n_true
    # selectivity: the bloom removed the vast majority of non-matching rows
    assert n_pruned < n_all * 0.2

    got = bloom_filtered_join(orders, cust, "o_custkey", "c_custkey")
    want = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
    assert got.count() == want.count()
    assert sorted(r["o_orderkey"] for r in got.collect()) == sorted(
        r["o_orderkey"] for r in want.collect()
    )


def test_bloom_word_frame_is_bounded(spark):
    from spark_streaming_project_spark.operators.joins import bloom_build

    dim = spark.range(10_000).select(F.col("id").alias("k"))
    bloom = bloom_build(dim, "k", bits_log2=16)
    assert bloom.count() <= (1 << 16) // 64


def test_choose_salt_factor_measures_skew(spark):
    """Uniform keys -> factor 1 (salting disabled); one hot key ->
    factor = ceil(hot/target); the salted join with the chosen factor
    still equals the plain join."""
    from spark_streaming_project_spark.operators.joins import (
        choose_salt_factor,
        skew_salted_join,
    )

    uniform = spark.range(1000).select((F.col("id") % 100).alias("k"))
    assert choose_salt_factor(uniform, "k", target_rows_per_task=50) == 1

    skewed = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id")).alias("k")
    )
    stats: dict = {}
    f = choose_salt_factor(skewed, "k", target_rows_per_task=100, stats=stats)
    assert f == 9 and stats["hottest_key"] == 7 and stats["hottest_count"] == 900

    small = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    plain = {
        (r["k"], r["v"])
        for r in skewed.join(small, "k").select("k", "v").collect()
    }
    salted = {
        (r["k"], r["v"])
        for r in skew_salted_join(skewed, small, "k", salt_factor=f)
        .select("k", "v")
        .collect()
    }
    assert salted == plain


def test_strategy_join_picks_broadcast_and_shuffle(spark):
    """The measured chooser: a small dimension gets a BroadcastHashJoin,
    a dimension over threshold falls back to a shuffle join — results
    identical either way."""
    from spark_streaming_project_spark.operators.joins import strategy_join

    fact = spark.range(0, 10_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )

    # disable Catalyst's own size-based auto-broadcast so the plan
    # reflects ONLY the operator's decision (a 100-row dim would be
    # auto-broadcast regardless, masking the chooser)
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        stats = {}
        small = strategy_join(fact, dim, "k", broadcast_threshold_rows=1000,
                              stats=stats)
        assert stats["strategy"] == "broadcast"
        assert "BroadcastHashJoin" in             small._jdf.queryExecution().executedPlan().toString()

        stats2 = {}
        big = strategy_join(fact, dim, "k", broadcast_threshold_rows=10,
                            stats=stats2)
        assert stats2["strategy"] == "shuffle"
        assert "BroadcastHashJoin" not in             big._jdf.queryExecution().executedPlan().toString()

        assert sorted(map(tuple, small.collect())) ==             sorted(map(tuple, big.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

