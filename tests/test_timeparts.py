"""Date-partitioned event storage: writes must produce one Hive-style
day directory per event date, ranged reads must prune at the partition
level (PartitionFilters, non-matching directories never scanned), and the
pruned read must equal the equivalent filter over the raw table."""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from spark_streaming_project_spark.sources.batch import load_table
from spark_streaming_project_spark.sources.timeparts import (
    read_days,
    write_time_partitioned,
)

from .conftest import SF_CORRECT


def test_write_creates_day_directories_and_roundtrips(spark, tmp_path):
    ev = load_table(spark, SF_CORRECT, "events")
    path = str(tmp_path / "events_by_day")
    write_time_partitioned(ev, path)

    days = sorted(d for d in os.listdir(path) if d.startswith("event_date="))
    n_days = ev.select(F.to_date("ts").alias("d")).distinct().count()
    assert len(days) == n_days
    # full-table roundtrip preserves every row and the raw timestamp
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert "ts" in back.columns and "event_date" in back.columns


def test_ranged_read_prunes_partitions_and_matches_raw_filter(spark, tmp_path):
    ev = load_table(spark, SF_CORRECT, "events")
    path = str(tmp_path / "events_by_day")
    write_time_partitioned(ev, path)

    lo, hi = "2024-01-05", "2024-01-07"
    pruned = read_days(spark, path, lo, hi)

    buf = io.StringIO()
    with redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "event_date" in plan

    want = ev.filter(
        (F.to_date("ts") >= F.lit(lo)) & (F.to_date("ts") <= F.lit(hi))
    ).count()
    got = pruned.count()
    assert got == want and got > 0
    # and strictly fewer rows than the full table (pruning did something)
    assert got < ev.count()


def test_backfill_rewrites_only_target_day(spark, tmp_path):
    ev = load_table(spark, SF_CORRECT, "events")
    path = str(tmp_path / "events_by_day")
    write_time_partitioned(ev, path)

    from spark_streaming_project_spark.sources.timeparts import backfill_days

    # "recompute" one day with corrected values (value * 2)
    day = "2024-01-03"
    fixed = ev.filter(F.to_date("ts") == F.lit(day)).withColumn(
        "value", F.col("value") * 2
    )
    n_day = fixed.count()
    assert n_day > 0
    before_other = (
        spark.read.parquet(path)
        .filter(F.col("event_date") != F.lit(day).cast("date"))
        .count()
    )
    backfill_days(fixed, path)

    after = spark.read.parquet(path)
    # target day fully replaced with doubled values
    got_day = after.filter(F.col("event_date") == F.lit(day).cast("date"))
    assert got_day.count() == n_day
    want_sum = fixed.agg(F.sum("value")).collect()[0][0]
    assert got_day.agg(F.sum("value")).collect()[0][0] == want_sum
    # every other day untouched
    assert (
        after.filter(F.col("event_date") != F.lit(day).cast("date")).count()
        == before_other
    )
    # conf restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        != "dynamic"
    )


def test_schema_evolution_merge_read(spark, tmp_path):
    from spark_streaming_project_spark.sources.timeparts import read_evolved

    path = str(tmp_path / "evolved")
    old = spark.createDataFrame([(1, "a")], "id bigint, s string").withColumn(
        "event_date", F.lit("2024-01-01").cast("date")
    )
    new = spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, s string, score double"
    ).withColumn("event_date", F.lit("2024-01-02").cast("date"))
    old.write.partitionBy("event_date").mode("append").parquet(path)
    new.write.partitionBy("event_date").mode("append").parquet(path)

    merged = read_evolved(spark, path)
    assert "score" in merged.columns
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows == {1: None, 2: 9.5}
