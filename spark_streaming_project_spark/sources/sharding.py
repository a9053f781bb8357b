"""Hash-sharded corpus writer — the ACTIONABLE half of the
``shard_balance_stats`` planner (plans/llm.py): the planner reports token
skew for candidate shard counts, this module materializes the corpus at
the chosen count with the SAME deterministic shard assignment, so the
planner's numbers are exactly the layout the writer produces (pinned by
tests/test_sharding.py's planner-writer contract test).

Why it matters at scale: a 100 TB training corpus is consumed by fixed
fleets of data-loader workers; writing it as k hash shards of balanced
token mass (not row count — long documents dominate cost) is what makes
epoch sharding deterministic and loader wall-times uniform. The md5
bucket is reshuffle-proof: re-running the writer on the same ids yields
the same shards regardless of partitioning, executor count, or input
order, so incremental appends land in stable shards.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def shard_expr(id_col: Column, n_shards: int) -> Column:
    """Deterministic shard id in [0, n_shards): the first 4 hex digits of
    md5('shard:' || id) mod n_shards — the exact expression
    ``shard_balance_stats`` sweeps, shared so planner and writer can
    never drift (both engines replay it: DuckDB twin is
    ``CAST(('0x' || substr(md5('shard:' || id), 1, 4)) AS INT) % k``)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("shard:"), id_col.cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("bigint")
        % n_shards
    )


def write_sharded_corpus(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    mode: str = "overwrite",
) -> DataFrame:
    """Write ``df`` hash-sharded by ``id_col`` into ``path`` (one
    ``shard=N`` partition directory per shard) and return the read-back
    MANIFEST — per-shard doc and token counts computed from the files
    actually written, not from the input plan (read-after-write proof).

    The write repartitions ON the shard column first so each shard's rows
    are produced by one task set and the directory gets a bounded file
    count (without it, every input task appends a file into every shard
    directory — the k * tasks small-files explosion compact_parquet
    exists to clean up). Readers prune: a per-shard consumer scans
    ``shard=N`` only (PartitionFilters asserted in tests).
    """
    from ..functions.text import token_count

    sharded = df.withColumn("shard", shard_expr(F.col(id_col), n_shards))
    (
        sharded.repartition(n_shards, "shard")
        .write.partitionBy("shard")
        .mode(mode)
        .parquet(path)
    )
    back = df.sparkSession.read.parquet(path)
    toks = (
        token_count(text_col)
        if text_col is not None and text_col in back.columns
        else F.lit(0)
    )
    return (
        back.groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.coalesce(F.sum(toks), F.lit(0)).cast("bigint").alias("n_tokens"),
        )
        .orderBy("shard")
    )


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """One shard's rows via partition pruning — the filter lands in the
    scan's PartitionFilters (shard is a directory column), so a loader
    worker reads ~1/n_shards of the bytes, never the whole corpus."""
    return spark.read.parquet(path).filter(F.col("shard") == shard)
