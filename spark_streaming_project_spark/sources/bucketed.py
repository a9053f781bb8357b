"""Bucketed-table layout: the co-located-join strategy for repeated big
joins at warehouse scale.

A join between two tables bucketed by the join key with the same bucket
count needs NO shuffle — each task reads matching bucket files from both
sides. At 100 TB this turns the nightly fact-to-fact join from a
full-network shuffle into a local merge; the price is one bucketed write
(a single clustering shuffle) paid once at ingest, amortized over every
downstream join/aggregation on that key. (The reference has no joins at
all — SURVEY.md §2.8 — so this is pure scale extension.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    num_buckets: int = 16,
    sort_keys: list[str] | None = None,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sort-ordered) by ``keys``. Joins/aggregations on ``keys`` between
    tables sharing the bucket spec then plan without an Exchange; sorted
    buckets additionally drop the Sort below a SortMergeJoin.

    Concurrency caveat: table names are caller-fixed, so TWO sessions
    sharing one spark.sql.warehouse.dir and writing the same name race
    (the drop+rmtree below is idempotent against STALE leftovers, not
    against a live concurrent writer). Run registry sims/benches that
    exercise bucketed queries one at a time per warehouse, or namespace
    the table per session — the production posture at scale anyway.
    """
    # Idempotent under stale warehouse dirs: a table directory left by a
    # previous session (not in this session's catalog) makes saveAsTable
    # fail with LOCATION_ALREADY_EXISTS even in overwrite mode.
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    location = (
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        + f"/{table.lower()}"
    )
    import shutil

    shutil.rmtree(location, ignore_errors=True)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, keys[0], *keys[1:])
    )
    if sort_keys:
        writer = writer.sortBy(sort_keys[0], *sort_keys[1:])
    writer.saveAsTable(table)
