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

from ..functions.partitioning import spread
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
    # r13: spread before the tokenize + per-chunk slice transform
    # (functions/partitioning.spread)
    return (
        spread(df.select(F.col(id_col), F.col(text_col)), id_col)
        .select(F.col(id_col), toks.alias("_w"))
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


def cdc_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    gram: int = 8,
    divisor: int = 64,
) -> DataFrame:
    """CONTENT-DEFINED chunking (the FastCDC/rsync family): cut each
    document after every position whose ``gram``-char window hashes to
    0 mod ``divisor`` — boundaries are a pure function of LOCAL content,
    so inserting a byte only reslices text up to the next boundary and
    every later chunk keeps its identity. That locality is what makes
    chunk-hash dedup robust to edits, where fixed-window chunking
    (chunk_documents) reslices the whole tail.

    Returns (id, chunk_start, chunk_len, chunk_hash, chunk_text); chunks
    concatenate back to the exact original text. Expected chunk length ~=
    ``divisor`` chars.

    Distributed shape: the whole operator is ONE narrow projection —
    boundary positions come from a higher-order filter over
    sequence(1, len), cut spans from an indexed transform over that
    bounded array, and a single explode emits the chunk rows. No shuffle
    anywhere (never the per-position explode-regroup: that shape would
    shuffle the full text twice), so it streams statelessly and chunks
    100 TB as a map-only pass inside whole-stage codegen. The md5-derived
    boundary test and chunk hashes replay in any engine.
    """
    L = int(gram)
    # r13: spread before the per-CHARACTER boundary-hash filter (the most
    # expensive narrow pass in the engine — one md5 per text position);
    # serialized on a few scan partitions it dominates every CDC query
    # (measured 2.2 s -> 0.30 s at sf0.1, functions/partitioning.spread).
    base = spread(
        df.filter(
            F.col(text_col).isNotNull() & (F.length(text_col) >= L)
        ).select(F.col(id_col).alias("id"), F.col(text_col).alias("_t")),
        "id",
    )
    # cut positions: e = p + L - 1 for every boundary window start p, plus
    # the end of the document; the filtered sequence is ascending and
    # len(text) >= every e, so array_distinct alone keeps it sorted.
    ends = F.expr(
        f"""array_distinct(concat(
            transform(
                filter(sequence(1, length(_t) - {L - 1}),
                       p -> cast(conv(substring(md5(substring(_t, p, {L})),
                                      1, 4), 16, 10) as bigint)
                            % {int(divisor)} = 0),
                p -> p + {L - 1}),
            array(length(_t))))"""
    )
    spans = F.expr(
        """transform(_ends, (e, i) ->
               struct(CASE WHEN i = 0 THEN 1
                           ELSE element_at(_ends, i) + 1 END AS s,
                      e AS e))"""
    )
    return (
        base.withColumn("_ends", ends)
        .select("id", "_t", F.explode(spans).alias("_sp"))
        .select(
            "id",
            F.col("_sp.s").cast("long").alias("chunk_start"),
            (F.col("_sp.e") - F.col("_sp.s") + 1)
            .cast("long")
            .alias("chunk_len"),
            F.expr("substring(_t, _sp.s, _sp.e - _sp.s + 1)").alias(
                "chunk_text"
            ),
        )
        .withColumn("chunk_hash", F.md5("chunk_text"))
    )


def ffd_pack_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bin_tokens: int = 256,
    n_shards: int = 32,
) -> DataFrame:
    """First-fit-decreasing sequence packing: per shard (``id %
    n_shards``), documents sorted by (n_tokens DESC, id ASC) each go into
    the lowest-numbered bin with room — the classic bin-packing
    heuristic for ATOMIC documents (each doc wholly inside one bin, the
    contract when sequences must not straddle context windows). Less
    padding than next-fit because big docs claim bins first and small
    docs backfill the gaps; the contiguous packer (``pack_documents``)
    is the other contract — docs straddle bin boundaries, zero padding,
    split-attention downstream.

    Bin assignment is inherently SEQUENTIAL state (which bins have room
    depends on every prior placement), so this is the one packing tier
    that is not expressible as window functions: it runs as
    ``applyInPandas`` over the shard groups — Arrow-batched, one Python
    pass per shard, deterministic. The scale contract is the same as
    every sharded tier: pick ``n_shards`` so a shard's doc list fits an
    executor (the SNM window-overlap discipline); shards are independent
    and the shuffle is one exchange keyed by shard.

    Returns (shard, bin_id, doc_id, n_tokens) — one row per document.
    Docs longer than ``bin_tokens`` get a bin of their own (standard FFD
    oversize handling).
    """
    sized = (
        df.select(
            F.col(id_col),
            F.size(tokens(text_col)).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn("shard", (F.col(id_col) % n_shards).cast("long"))
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        )
        remaining: list[int] = []  # bin_id -> remaining capacity
        bins = []
        for n in pdf["n_tokens"]:
            n = int(n)
            for b, room in enumerate(remaining):
                if room >= n:
                    remaining[b] = room - n
                    bins.append(b)
                    break
            else:
                remaining.append(max(0, bin_tokens - n))
                bins.append(len(remaining) - 1)
        return pd.DataFrame(
            {
                "shard": pdf["shard"].values,
                "bin_id": bins,
                id_col: pdf[id_col].values,
                "n_tokens": pdf["n_tokens"].values,
            }
        )

    return sized.groupBy("shard").applyInPandas(
        pack, f"shard long, bin_id long, {id_col} long, n_tokens long"
    )
