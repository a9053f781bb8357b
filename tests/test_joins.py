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
