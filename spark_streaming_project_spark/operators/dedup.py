"""Deduplication operators for training-data pipelines (BASELINE.json
north-star): exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the 100 TB contract):
  - Exact dedup is a hash groupBy on a digest — one shuffle keyed on the
    digest, no text comparison.
  - MinHash signatures are computed per-row from the shingle array
    (array-level ``transform``/``aggregate`` — no explode, no shuffle), then
    LSH *banding* turns near-dup search into an equi-join on band keys: only
    documents sharing a band collide, so the join output is ~candidates, not
    O(n²). Verification (true Jaccard) runs only on candidates.
  - Hash functions are md5-based: deterministic, seedable by prefixing, and
    available in every engine (which is what makes the DuckDB oracle able to
    replay the whole pipeline bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_shingles

NUM_PERM = 8  # minhash permutations
BAND_SIZE = 2  # rows per LSH band -> NUM_PERM/BAND_SIZE bands


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: md5-digest groupBy; representative = min id.

    Output: one row per distinct content (keep_id, dup_count, content_hash).
    At scale the shuffle key is the 32-char digest, never the document body.
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


def _minhash_sig(shingles: Column, perm: int) -> Column:
    """One minhash value: lexicographic min of seeded md5 digests over the
    shingle set (min-wise hashing over a seeded hash family)."""
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{perm}:"), s)))
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_perm: int = NUM_PERM
) -> DataFrame:
    """Per-document minhash signature columns sig_0..sig_{k-1} plus the
    distinct shingle array (kept for the verification join)."""
    sh = word_shingles(text_col)
    out = df.select(
        F.col(id_col),
        sh.alias("shingles"),
    ).filter(F.size("shingles") > 0)
    for p in range(num_perm):
        out = out.withColumn(f"sig_{p}", _minhash_sig(F.col("shingles"), p))
    return out


def lsh_band_keys(num_perm: int = NUM_PERM, band_size: int = BAND_SIZE) -> Column:
    """Array of band keys: digest of the concatenated signature rows in each
    band, salted with the band index so bands never cross-collide."""
    bands = []
    for b in range(0, num_perm, band_size):
        parts = [F.lit(f"b{b}:")] + [F.col(f"sig_{i}") for i in range(b, b + band_size)]
        bands.append(F.md5(F.concat(*parts)))
    return F.array(*bands)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    num_perm: int = NUM_PERM,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """Near-duplicate pairs via MinHash+LSH, verified by true shingle Jaccard.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    """
    sigs = minhash_signatures(df, text_col, id_col, num_perm)
    bands = sigs.select(
        F.col(id_col),
        F.col("shingles"),
        F.explode(lsh_band_keys(num_perm, band_size)).alias("band"),
    )
    left = bands.select(
        F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"), "band"
    )
    right = bands.select(
        F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"), "band"
    )
    cand = (
        left.join(right, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """SimHash fingerprints: sign-sum of per-token hash bits.

    Token hashes come from the first 8 hex chars of md5 (32-bit), so the
    whole computation is engine-portable. Bit i of the fingerprint is 1 iff
    the number of tokens with bit i set exceeds half the token count.
    Array-level (no explode): one pass, no shuffle.
    """
    from ..functions.text import tokens

    toks = F.array_distinct(tokens(text_col))
    h = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    n = F.size(toks)
    bit_votes = [
        F.size(F.filter(h, lambda v: v.bitwiseAND(F.lit(1 << i)) != 0))
        for i in range(bits)
    ]
    fingerprint = None
    for i, votes in enumerate(bit_votes):
        bit = F.when(votes * 2 > n, F.lit(1 << i)).otherwise(F.lit(0))
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return df.select(
        F.col(id_col), fingerprint.cast("long").alias("simhash")
    )
