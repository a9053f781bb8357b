"""Document chunking and sequence packing — the two transforms that sit
between a curated corpus and a training dataloader: split each document
into fixed-token-window chunks, then assign chunks/documents to
fixed-capacity bins (context windows).

Both are pure built-in-expression pipelines (no Python in the hot path) and
both are deterministic, so a DuckDB oracle replays them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 64,
) -> DataFrame:
    """Split each document into consecutive ``chunk_tokens``-token chunks:
    (id, chunk_idx, chunk_text, n_tokens); the last chunk may be short.

    Scale shape: tokenize once, explode a 0..n_chunks-1 index sequence, and
    slice the token array per index — no shuffle at all (narrow explode on
    the scan), so chunking 100 TB is a map-only pass. Empty/NULL docs yield
    no chunks.
    """
    toks = tokens(text_col)
    n_chunks = F.ceil(F.size("_w") / F.lit(chunk_tokens)).cast("long")
    return (
        df.select(F.col(id_col), toks.alias("_w"))
        .filter(F.size("_w") > 0)
        .select(
            F.col(id_col),
            "_w",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            F.col(id_col),
            "chunk_idx",
            F.array_join(
                F.slice("_w", F.col("chunk_idx") * chunk_tokens + 1, chunk_tokens),
                " ",
            ).alias("chunk_text"),
            F.size(
                F.slice("_w", F.col("chunk_idx") * chunk_tokens + 1, chunk_tokens)
            )
            .cast("long")
            .alias("n_tokens"),
        )
    )


def pack_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bin_tokens: int = 256,
    n_shards: int = 32,
) -> DataFrame:
    """Greedy contiguous sequence packing: per shard (``id % n_shards``),
    documents in id order fill ``bin_tokens``-capacity bins; a document
    belongs to the bin where its running-total START offset lands.

    The running sum is windowed PER SHARD — a single global ordered window
    would funnel the corpus through one task; sharding keeps packing
    parallel (the standard dataloader trick: pack within a shard, shuffle
    shards at read time). Deterministic for a given corpus and shard count.
    """
    sized = (
        df.select(
            F.col(id_col),
            F.size(tokens(text_col)).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        # shard must exist BEFORE the window projection (a lateral alias
        # can't be referenced from a window's PARTITION BY)
        .withColumn("shard", F.col(id_col) % n_shards)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_bin = sized.select(
        "shard",
        F.col(id_col),
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / bin_tokens)
        .cast("long")
        .alias("bin_id"),
    )
    return with_bin.groupBy("shard", "bin_id").agg(
        F.count("*").alias("doc_count"),
        F.sum("n_tokens").alias("total_tokens"),
    )
