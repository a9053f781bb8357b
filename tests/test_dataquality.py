"""Detection tests for the data-quality rules on deliberately dirty
fixtures — the registered report runs on clean testdata (all zeros), so
each rule must prove it actually fires."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_project_spark.operators.dataquality import (
    check_foreign_key,
    check_in_set,
    check_not_null,
    check_predicate,
    check_range,
    check_unique,
    dq_report,
)


def _v(df):
    return df.collect()[0]["violations"]


def test_not_null_counts_nulls(spark):
    df = spark.createDataFrame([(1, "a"), (2, None), (3, None)], "id bigint, s string")
    assert _v(check_not_null(df, "s")) == 2


def test_unique_counts_extra_rows_and_null_keys(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (None,)], "k bigint"
    )
    # 5 rows, 2 distinct non-null keys -> 3 violations (two extra 1s + the
    # NULL row, which countDistinct ignores)
    assert _v(check_unique(df, ["k"])) == 3


def test_unique_multi_column(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b")], "k bigint, s string"
    )
    assert _v(check_unique(df, ["k", "s"])) == 1


def test_in_set_ignores_null(spark):
    df = spark.createDataFrame(
        [("view",), ("click",), ("hack",), (None,)], "t string"
    )
    assert _v(check_in_set(df, "t", ["view", "click"])) == 1


def test_range_boundaries_inclusive(spark):
    df = spark.createDataFrame([(0,), (1,), (50,), (51,), (None,)], "q bigint")
    assert _v(check_range(df, "q", 1, 50)) == 2


def test_predicate_null_is_violation(spark):
    df = spark.createDataFrame(
        [(4, 4), (4, 5), (None, 1)], "a bigint, b bigint"
    )
    assert _v(check_predicate(df, F.col("a") == F.col("b"), "eq")) == 2


def test_foreign_key_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk bigint")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    # 9 is an orphan; NULL fk is not an fk violation
    assert _v(check_foreign_key(child, "fk", parent, "pk")) == 1


def test_report_unions_all_rules(spark):
    df = spark.createDataFrame([(1, None)], "id bigint, s string")
    rep = dq_report(
        [check_not_null(df, "s"), check_unique(df, ["id"])]
    )
    got = {r["rule"]: r["violations"] for r in rep.collect()}
    assert got == {"not_null:s": 1, "unique:id": 0}
