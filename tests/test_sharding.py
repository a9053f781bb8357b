"""Hash-sharded corpus writer: layout, round-trip, partition pruning, and
the planner-writer contract (the shard_balance_stats numbers must be
exactly the layout write_sharded_corpus produces, because both sides
share one shard expression)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_streaming_project_spark.sources.batch import load_table
from spark_streaming_project_spark.sources.sharding import (
    read_shard,
    shard_expr,
    write_sharded_corpus,
)

SF = "/root/testdata/sf0.001"


def test_sharded_write_roundtrip_and_layout(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "corpus")
    manifest = write_sharded_corpus(docs, path, n_shards=8).collect()

    # layout: only shard=N partition directories, all within [0, 8)
    dirs = sorted(
        d for d in os.listdir(path) if d.startswith("shard=")
    )
    assert dirs and all(0 <= int(d.split("=")[1]) < 8 for d in dirs)
    assert len(dirs) == len(manifest)

    # round-trip: the union of shards is exactly the source (no row lost,
    # duplicated, or mutated by the partitioned write)
    back = spark.read.parquet(path)
    src = {tuple(r) for r in docs.collect()}
    got = {tuple(r) for r in back.drop("shard").collect()}
    assert got == src

    # determinism: re-deriving the shard from doc_id matches the
    # directory every row landed in (reshuffle-proof md5 assignment)
    rederived = back.withColumn(
        "_expect", shard_expr(F.col("doc_id"), 8)
    ).filter(F.col("shard") != F.col("_expect"))
    assert rederived.count() == 0


def test_read_shard_prunes_partitions(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "corpus")
    write_sharded_corpus(docs, path, n_shards=8)

    df = read_shard(spark, path, 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the shard filter must land in PartitionFilters (directory pruning),
    # not in a post-scan Filter over all shards
    assert "PartitionFilters" in plan and "shard" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    assert df.count() > 0
    assert df.select("shard").distinct().collect()[0][0] == 3


def test_manifest_matches_shard_balance_planner(spark, tmp_path):
    """Planner-writer contract: shard_balance_stats' k=8 row (max/total
    token mass, used shards) must equal the rollup of the MANIFEST the
    writer returns for n_shards=8 — same shard expression, same token
    counter, so the planning table IS the physical layout."""
    from spark_streaming_project_spark.plans import REGISTRY

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "corpus")
    manifest = write_sharded_corpus(docs, path, n_shards=8).collect()

    planner = {
        r["n_shards"]: r
        for r in REGISTRY["shard_balance_stats"].builder(spark, SF).collect()
    }[8]
    # writer shards ALL docs (null-text rows carry 0 tokens); the planner
    # sweeps non-null-text docs only — token masses agree because null
    # text contributes nothing, and used_shards agrees on this fixture
    # because every shard holds at least one non-null-text doc
    assert planner["max_tokens"] == max(r["n_tokens"] for r in manifest)
    assert planner["total_tokens"] == sum(r["n_tokens"] for r in manifest)
    assert planner["used_shards"] == len(manifest)


def test_streaming_sharded_appends_match_batch_layout(spark, tmp_path):
    """Streaming write-side leg: the corpus arrives in micro-batches,
    each appended HASH-SHARDED into the same partitioned layout, while
    the manifest is maintained incrementally (per-shard (docs, tokens)
    is an additive monoid). After the drain: (a) every row sits in the
    shard the md5 expression dictates — append order cannot move a doc's
    shard; (b) the incremental manifest state equals the manifest a
    one-shot batch write of the full corpus produces."""
    from spark_streaming_project_spark.functions.text import token_count
    from spark_streaming_project_spark.streaming import (
        StreamRunner,
        foreach_batch_incremental_agg,
        stream_parquet_dir,
    )

    docs = load_table(spark, SF, "documents")
    src = str(tmp_path / "src")
    for i in range(3):  # three micro-batches
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    schema = spark.read.parquet(src).schema

    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "manifest_state")

    inner = foreach_batch_incremental_agg(
        state,
        lambda df: df.groupBy(
            shard_expr(F.col("doc_id"), 8).alias("shard")
        ).agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.coalesce(F.sum(token_count("text")), F.lit(0))
            .cast("bigint")
            .alias("n_tokens"),
        ),
        ["shard"],
        ["n_docs", "n_tokens"],
    )

    def sink(df, batch_id):
        (
            df.withColumn("shard", shard_expr(F.col("doc_id"), 8))
            .repartition(8, "shard")
            .write.partitionBy("shard")
            .mode("append")
            .parquet(corpus)
        )
        inner(df, batch_id)

    stream = stream_parquet_dir(spark, src, schema, max_files_per_trigger=1)
    runner = StreamRunner(spark, str(tmp_path / "ckpt"))
    runner.add("sharded_append", stream, foreach_batch=sink)
    runner.start_all(available_now=True)
    runner.await_all(timeout_sec=120)

    # (a) every appended row is in its md5-dictated shard directory
    back = spark.read.parquet(corpus)
    misplaced = back.withColumn(
        "_expect", shard_expr(F.col("doc_id"), 8)
    ).filter(F.col("shard") != F.col("_expect"))
    assert misplaced.count() == 0
    assert {tuple(r) for r in back.drop("shard").collect()} == {
        tuple(r) for r in docs.collect()
    }

    # (b) incremental manifest state == one-shot batch write's manifest
    batch_manifest = {
        (r["shard"], r["n_docs"], r["n_tokens"])
        for r in write_sharded_corpus(
            docs, str(tmp_path / "batch_corpus"), n_shards=8
        ).collect()
    }
    got = {
        (r["shard"], r["n_docs"], r["n_tokens"])
        for r in spark.read.parquet(state)
        .select("shard", "n_docs", "n_tokens")
        .collect()
    }
    assert got == batch_manifest and got
