"""Date-partitioned event storage: the canonical 100 TB event-table layout
(one parquet directory per day, Hive-style ``event_date=YYYY-MM-DD``),
with reads that prune to the requested days at the FILE LISTING level.

Why it matters at scale: an events table is queried overwhelmingly by time
range; a day-partitioned layout turns "last 7 days" into opening ~7/365 of
the files — the scan never lists, opens, or footers the rest. The partition
column is derived (date of ``ts``), kept alongside the full-precision
timestamp. (The reference has no storage layout story at all — its sink is
JDBC overwrite; this is the parquet-lake counterpart, same family as
``compaction.compact_parquet`` and the IVF ``list_id`` layout at
`operators/similarity.py:269`.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_time_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts", mode: str = "overwrite"
) -> None:
    """Write ``df`` partitioned by ``event_date`` (the date of ``ts_col``).

    Dynamic partitioning: each task writes only the day-directories its
    rows touch. For a streaming ingest, pair with ``foreachBatch`` + the
    compactor — appends land as small files per day, compaction rewrites
    closed days.
    """
    (
        df.withColumn("event_date", F.to_date(F.col(ts_col)))
        .write.partitionBy("event_date")
        .mode(mode)
        .parquet(path)
    )


def read_days(
    spark: SparkSession, path: str, start_date: str, end_date: str
) -> DataFrame:
    """Scan only the day-partitions in [start_date, end_date] (inclusive).

    The filter compares the PARTITION column, so Catalyst resolves it
    during file listing (visible as PartitionFilters in the scan node,
    asserted by tests/test_timeparts.py) — non-matching directories are
    never opened.
    """
    return spark.read.parquet(path).filter(
        (F.col("event_date") >= F.lit(start_date).cast("date"))
        & (F.col("event_date") <= F.lit(end_date).cast("date"))
    )


def backfill_days(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Idempotently recompute the day-partitions PRESENT IN ``df`` without
    touching any other day (dynamic partition overwrite — the backfill
    primitive: re-deriving one corrupted/late day must not rewrite the
    table).

    Spark's static overwrite mode would drop EVERY partition first; the
    conf flips to dynamic for this write and is restored after, so the
    session's default behavior is unchanged.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        (
            df.withColumn("event_date", F.to_date(F.col(ts_col)))
            .write.partitionBy("event_date")
            .mode("overwrite")
            .parquet(path)
        )
    finally:
        spark.conf.set(key, prev)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned table whose schema GREW over time (later days
    carry added columns): ``mergeSchema`` unions all file footers; rows
    from older files surface NULL for columns they predate. The standard
    additive-evolution contract for an append-only event lake."""
    return spark.read.option("mergeSchema", "true").parquet(path)
