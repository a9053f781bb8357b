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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.partitioning import spread
from ..functions.text import tokens, word_shingles

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


#: signature values carved out of one md5 digest (4 x 8 hex chars).
CHUNKS_PER_DIGEST = 4


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_perm: int = NUM_PERM
) -> DataFrame:
    """Per-document minhash signature columns sig_0..sig_{k-1} plus the
    distinct shingle array (kept for the verification join).

    Hash-family economy: one md5 per (seed-group, shingle) yields
    CHUNKS_PER_DIGEST independent 32-bit hex slices, so NUM_PERM signatures
    cost NUM_PERM/CHUNKS_PER_DIGEST digests per shingle. Digest arrays are
    materialized in their own projection stage so the per-chunk minima reuse
    them instead of re-hashing (higher-order lambdas are interpreted — the
    signature pass is hash-bound at scale, and this cuts it 4x).
    """
    sh = word_shingles(text_col)
    # r13: spread the raw (id, text) rows BEFORE the shingle+digest pass —
    # the signature pipeline below is ~10 interpreted array passes per doc
    # and must not serialize onto a few scan partitions (functions/
    # partitioning.spread; measured 1.6 s -> 0.65 s at sf0.1).
    out = spread(df.select(F.col(id_col), F.col(text_col)), id_col).select(
        F.col(id_col),
        sh.alias("shingles"),
    ).filter(F.size("shingles") > 0)
    # NOTE: these lambdas are SQL-parsed (F.expr), not DataFrame-API lambdas.
    # Chained withColumn HOFs built via F.transform(lambda ...) collide on
    # lambda-variable ids when CollapseProject merges the projections
    # (observed on Spark 4.1: silently wrong results); expr() re-parses and
    # the analyzer assigns fresh ids per expression.
    n_groups = (num_perm + CHUNKS_PER_DIGEST - 1) // CHUNKS_PER_DIGEST
    for g in range(n_groups):
        out = out.withColumn(
            f"_dig_{g}", F.expr(f"transform(shingles, s -> md5(concat('{g}:', s)))")
        )
    for p in range(num_perm):
        g, chunk = divmod(p, CHUNKS_PER_DIGEST)
        out = out.withColumn(
            f"sig_{p}",
            F.expr(
                f"array_min(transform(_dig_{g}, d -> substring(d, {chunk * 8 + 1}, 8)))"
            ),
        )
    return out.drop(*[f"_dig_{g}" for g in range(n_groups)])


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
    # Materialize signatures once: the plan fans out into four consumers
    # (band self-join left/right + shingle lookups a/b) and Spark does not
    # share subplans — without persist the whole shingle+digest pass would
    # re-run per consumer. At warehouse scale this persist is a signature
    # TABLE (the standard LSH-dedup shape: sign once, band-join many).
    # Cache lifetime: the signatures back the returned LAZY pair frame,
    # so no in-function unpersist is possible; the caller releases after
    # its terminal action (bench.py/driver sim clearCache between queries).
    sigs = minhash_signatures(df, text_col, id_col, num_perm).persist()
    # the band self-join runs on SKINNY (id, band) rows — shingle arrays are
    # joined back only for the (small) candidate set, so the shuffle volume
    # is O(candidates), not O(docs x band_width x shingles)
    bands = sigs.select(
        F.col(id_col),
        F.explode(lsh_band_keys(num_perm, band_size)).alias("band"),
    )
    cand = (
        bands.select(F.col(id_col).alias("id_a"), "band")
        .join(bands.select(F.col(id_col).alias("id_b"), "band"), "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sets = sigs.select(F.col(id_col), "shingles")
    cand = (
        cand.join(
            sets.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")),
            "id_a",
        )
        .join(
            sets.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")),
            "id_b",
        )
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT n-gram-Jaccard near-dup pairs: every (id_a < id_b) pair whose
    distinct word-n-gram Jaccard >= threshold. No misses, unlike LSH.

    Strategy: inverted-index self-join on the gram string, count matches
    per pair (= |intersection|), then |union| = na + nb - inter from the
    per-doc gram counts. All stages are narrow-row equi-joins/groupBys —
    no shingle array ever reaches the pair stage, so the intermediate is
    cheap rows, not payloads.

    Cost model: sum over grams of df(g)^2. On corpora with a dense shared
    vocabulary (every pair overlaps a little — like the synthetic bench
    corpus) this beats candidate-set methods because candidates ≈ all
    pairs there. On sparse real-text corpora where most pairs share
    nothing, use ``ngram_jaccard_pairs_prefix`` (AllPairs/PPJoin prefix
    filtering), which prunes candidate generation to the rarest grams per
    document and wins asymptotically.
    """
    # One shingle pass total: shingling is interpreted higher-order lambdas
    # (the most expensive expression in the pipeline) and this frame feeds
    # three consumers (sizes + both self-join sides) — unpersisted, Spark
    # recomputes it per consumer. MEMORY_AND_DISK, skinny (id, gram) rows.
    # Cache lifetime: backs the returned LAZY frame; caller releases after
    # its terminal action (bench.py/driver sim clearCache between queries).
    grams = spread(df.select(F.col(id_col), F.col(text_col)), id_col).select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("gram")
    ).persist()
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    inter = (
        grams.select(F.col(id_col).alias("id_a"), "gram")
        .join(grams.select(F.col(id_col).alias("id_b"), "gram"), "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_inter"))
    )
    res = inter.join(
        sizes.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("_na")),
        "id_a",
    ).join(
        sizes.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("_nb")),
        "id_b",
    )
    jac = F.col("_inter").cast("double") / (
        F.col("_na") + F.col("_nb") - F.col("_inter")
    )
    return res.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Same exact result as ``ngram_jaccard_pairs`` via PREFIX FILTERING
    (AllPairs/PPJoin family) — the sparse-corpus / open-web scale path.

    In a global canonical gram order (document frequency ASC, then hash —
    rarest grams first), any pair with Jaccard >= t shares a gram within
    each side's first ``|g| - ceil(t*|g|) + 1`` grams: were x's
    smallest-ordered common gram outside the prefix, the suffix
    (< t*|x| grams) couldn't hold the >= t*|x| common grams. The candidate
    self-join therefore explodes only PREFIX grams — frequent grams land
    outside prefixes, killing the df(g)^2 blowup — and candidates are
    verified exactly on the full shingle arrays.

    Grams travel as xxhash64 LONGs: a collision can only ADD a candidate
    (exact verification discards it), so shuffle keys stay 8 bytes with
    zero correctness risk. Prefer this variant when most document pairs
    share no gram (real text at scale); on dense-vocabulary corpora where
    nearly all pairs overlap, candidates ≈ all pairs and the count-based
    variant wins instead.
    """
    sh = (
        spread(df.select(F.col(id_col), F.col(text_col)), id_col)
        .select(F.col(id_col), word_shingles(text_col, n).alias("shingles"))
        .filter(F.size("shingles") > 0)
        .persist()  # consumed by prefix generation + two verification
        # joins. Cache lifetime: backs the returned LAZY pair frame;
        # caller releases (bench.py/driver sim clearCache between queries)
    )
    # _ng rides along from size(shingles) — cheaper than a count() window
    # over the exploded frame (one whole window aggregation removed).
    exploded = sh.select(
        F.col(id_col),
        F.size("shingles").alias("_ng"),
        F.explode(F.expr("transform(shingles, s -> xxhash64(s))")).alias("h"),
    )
    gram_df = exploded.groupBy("h").agg(F.count("*").alias("_df"))
    w_rank = Window.partitionBy(id_col).orderBy("_df", "h")
    prefix = (
        exploded.join(gram_df, "h")
        .select(
            F.col(id_col),
            "h",
            F.row_number().over(w_rank).alias("_rn"),
            "_ng",
        )
        .filter(
            F.col("_rn")
            <= F.col("_ng") - F.ceil(F.lit(threshold) * F.col("_ng")) + 1
        )
        .persist()  # both sides of the candidate self-join (same
        # Cache lifetime contract as the shingle frame above)
    )
    # Overlap threshold: J >= t  <=>  inter >= t/(1+t) * (na+nb).
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("_ng_a") + F.col("_ng_b"))
    )
    cand = (
        prefix.select(
            F.col(id_col).alias("id_a"),
            F.col("_ng").alias("_ng_a"),
            F.col("_rn").alias("_rn_a"),
            "h",
        )
        .join(
            prefix.select(
                F.col(id_col).alias("id_b"),
                F.col("_ng").alias("_ng_b"),
                F.col("_rn").alias("_rn_b"),
                "h",
            ),
            "h",
        )
        # AllPairs LENGTH filter: Jaccard >= t forces
        # min(|x|,|y|) >= |x∩y| >= t·|x∪y| >= t·max(|x|,|y|), so size-skewed
        # pairs are dropped before the (expensive) exact-verify join.
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("_ng_a") >= F.ceil(F.lit(threshold) * F.col("_ng_b")))
            & (F.col("_ng_b") >= F.ceil(F.lit(threshold) * F.col("_ng_a")))
            # PPJoin POSITIONAL filter (Xiao et al. 2008): a gram matched at
            # ranks (ra, rb) caps the overlap from that gram onward at
            # 1 + min(ng_a-ra, ng_b-rb); the FIRST shared gram in the
            # canonical order has no overlap before it, so every true pair
            # keeps at least that generating row and pruning rows below the
            # alpha overlap threshold loses nothing.
            & (
                F.lit(1)
                + F.least(
                    F.col("_ng_a") - F.col("_rn_a"),
                    F.col("_ng_b") - F.col("_rn_b"),
                )
                >= alpha
            )
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    verified = cand.join(
        sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("_sh_a")),
        "id_a",
    ).join(
        sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("_sh_b")),
        "id_b",
    )
    jac = F.size(F.array_intersect("_sh_a", "_sh_b")).cast("double") / F.size(
        F.array_union("_sh_a", "_sh_b")
    )
    return verified.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def choose_ngram_strategy(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    sample_fraction: float = 0.1,
    seed: int = 42,
    dense_cutoff: float = 4.0,
) -> str:
    """Pick "inverted" vs "prefix" for exact n-gram Jaccard from a SAMPLED
    gram-frequency sketch (ROADMAP: replaces the manual choice).

    Statistic: lambda = expected number of shared grams per document pair
    = sum_g df(g)*(df(g)-1)/2 over pairs(D,2), estimated on a
    ``sample_fraction`` document sample. Dense shared vocabulary (every
    pair overlaps a little) means candidates ~ all pairs, so the
    counting/inverted-index plan wins; sparse corpora (most pairs share
    nothing) reward prefix filtering's candidate pruning. The sketch is
    two scalar aggregates over the sampled exploded grams — nothing but
    the two numbers reaches the driver, so the probe costs one sampled
    scan at any corpus size. Sampling uniformly scales both df(g) and D,
    leaving lambda's expectation ~ invariant (it is a per-pair density).
    """
    sample = df.sample(fraction=sample_fraction, seed=seed) if sample_fraction < 1.0 else df
    grams = sample.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("gram")
    )
    collisions = (
        grams.groupBy("gram")
        .agg(F.countDistinct(id_col).alias("_df"))
        .agg(
            F.sum(F.col("_df") * (F.col("_df") - 1) / 2).alias("_collisions"),
        )
    )
    # r13 (guide §2.6): both probe scalars in ONE action — the old shape
    # collected the collision sum and then ran a second job for the doc
    # count, serializing two driver round-trips per adaptive query (the
    # chooser runs in front of every adaptive n-gram plan). The one-row
    # cross join evaluates both aggregates in a single job; the numbers
    # (and therefore the chosen strategy) are unchanged.
    docs_cnt = sample.select(id_col).distinct().agg(
        F.count("*").alias("_n_docs")
    )
    stats = collisions.crossJoin(docs_cnt).collect()[0]
    n_docs = stats["_n_docs"]
    if n_docs < 2 or stats["_collisions"] is None:
        return "prefix"
    lam = float(stats["_collisions"]) / (n_docs * (n_docs - 1) / 2)
    return "inverted" if lam >= dense_cutoff else "prefix"


def ngram_jaccard_pairs_adaptive(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    sample_fraction: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """Exact n-gram Jaccard pairs with the physical strategy chosen by
    ``choose_ngram_strategy``'s sampled density sketch. Both strategies
    produce identical results (equivalence-tested), so the choice is pure
    performance: dense corpus -> inverted-index counting, sparse ->
    AllPairs prefix filtering."""
    strategy = choose_ngram_strategy(
        df, text_col, id_col, n, sample_fraction, seed
    )
    op = ngram_jaccard_pairs if strategy == "inverted" else ngram_jaccard_pairs_prefix
    return op(df, text_col, id_col, n, threshold)


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """SimHash fingerprints: sign-sum of per-token hash bits.

    Token hashes come from the first ceil(bits/4) hex chars of md5 (min 8,
    i.e. 32-bit; up to 15 chars = 60 bits, still inside signed BIGINT), so
    the whole computation is engine-portable. Bit i of the fingerprint is 1
    iff the number of tokens with bit i set exceeds half the token count.
    Wider fingerprints exist for the banding math: at Hamming radius r the
    pigeonhole band key is bits/(r+1) wide, and the band-join candidate
    volume scales with n^2 / 2^(bits/(r+1)) — at corpus scale you buy
    headroom with bits, not with a different join.

    Single aggregate fold over the hash array (one interpreted pass) instead
    of ``bits`` separate filter passes — ~2.5x cheaper, and the vote vector
    shape is what a Pandas-UDF batch version would use at higher dims.
    """
    if bits > 60:  # not assert: must survive python -O (silent overflow)
        raise ValueError(
            f"bits={bits}: 15 md5 hex chars (60 bits) is the signed-BIGINT "
            "cap — conv() would overflow and corrupt fingerprints"
        )
    hex_chars = max(8, (bits + 3) // 4)
    # r13: spread before the per-token hash + vote folds (interpreted
    # HOFs) — see functions/partitioning.spread
    base = (
        spread(df.select(F.col(id_col), F.col(text_col)), id_col)
        .select(F.col(id_col), F.col(text_col).alias("_text"))
        .withColumn(
            "_toks",
            F.expr(r"array_distinct(filter(split(_text, '\\s+'), t -> t <> ''))"),
        )
        .filter(F.size("_toks") > 0)
        .withColumn(
            "_hs",
            F.expr(
                "transform(_toks, t -> cast(conv(substring(md5(t), 1, "
                f"{hex_chars}), 16, 10) AS BIGINT))"
            ),
        )
    )
    votes = base.withColumn(
        "_votes",
        F.expr(
            f"aggregate(_hs, array_repeat(cast(0 as bigint), {bits}), "
            "(acc, v) -> zip_with(acc, sequence(0, {m}), "
            "(x, i) -> x + ((v >> cast(i as int)) & 1)))".format(m=bits - 1)
        ),
    )
    return votes.select(
        F.col(id_col),
        F.expr(
            f"aggregate(zip_with(_votes, sequence(0, {bits - 1}), "
            "(c, i) -> if(2*c > size(_hs), shiftleft(cast(1 as bigint), cast(i as int)), "
            "cast(0 as bigint))), cast(0 as bigint), (a, x) -> a + x)"
        ).alias("simhash"),
    )

def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 32,
    max_hamming: int = 1,
) -> DataFrame:
    """EXACT SimHash near-dup pairs: (id_a < id_b, hamming) for every pair
    whose ``bits``-bit SimHash fingerprints differ in <= ``max_hamming``
    bits. No misses: fingerprints are split into ``max_hamming + 1``
    equal-width bands, and by pigeonhole any pair within the cutoff agrees
    exactly on at least one band — so a band-value equi-join generates a
    complete candidate set, and bit_count(xor) verifies exactly.

    Scale shape: the self-join shuffles on (band_index, band_value) — a
    32/(k+1)-bit key, not the document — so shuffle rows are (id, sig,
    band) triples and the quadratic blowup is confined to same-band
    groups (2^bandwidth buckets spread hot fingerprints). The full
    fingerprint RIDES ALONG on the band rows (8 bytes), so verification
    is an inline xor+popcount ON the join output — no candidate
    materialization, no dropDuplicates over the quadratic candidate set,
    no join-back to the signature table. Only pairs that SURVIVE the
    Hamming cutoff reach the final distinct, and that set is
    output-sized, not candidate-sized. (At radius 3 with 8-bit bands the
    candidate set is ~100x the output; deduplicating after the cheap
    verify instead of before it is a ~4x wall-clock win at sf0.1.)
    One scan computes fingerprints; bands derive by bit-slicing (no
    second pass over text).
    """
    n_bands = max_hamming + 1
    width = bits // n_bands
    if n_bands * width != bits:  # not assert: must survive python -O
        raise ValueError(
            f"bits={bits} is not divisible by max_hamming+1={n_bands}: "
            "the pigeonhole bands must evenly split the fingerprint"
        )
    # persist: the fingerprint fold (interpreted higher-order aggregate
    # over the token-hash array) dominates the scan; both sides of the
    # band self-join must read it from the materialized form, not
    # recompute it. Cache lifetime is bounded by the harness-level
    # clearCache (see ROADMAP r09 unpersist adjudication).
    sigs = simhash(df, text_col, id_col, bits).persist()
    mask = (1 << width) - 1
    bands = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        (
                            F.shiftright("simhash", b * width).bitwiseAND(F.lit(mask))
                        ).alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_band"),
    ).select(F.col(id_col), "simhash", "_band.band_idx", "_band.band_val")
    joined = bands.select(
        F.col(id_col).alias("id_a"),
        F.col("simhash").alias("_sig_a"),
        "band_idx",
        "band_val",
    ).join(
        bands.select(
            F.col(id_col).alias("id_b"),
            F.col("simhash").alias("_sig_b"),
            "band_idx",
            "band_val",
        ),
        ["band_idx", "band_val"],
    )
    hamming = F.bit_count(F.expr("_sig_a ^ _sig_b"))
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )



def incremental_dedup_verdicts(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.3,
    num_perm: int = NUM_PERM,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """Dedup a NEW batch against an EXISTING corpus: every batch document
    gets a verdict — ``exact_dup`` (byte-identical to a corpus doc),
    ``near_dup`` (MinHash-LSH candidate verified at ``threshold`` Jaccard
    against a corpus doc), or ``new``. Exact beats near when both hold.

    This is the steady-state ingestion shape (contrast the one-shot batch
    ops): the corpus side reduces to two precomputable INDEX tables — the
    distinct digest set and the (id, band) signature table — so a daily
    increment never rescans corpus text. Both probe joins are skinny
    (digest / band keys only); shingle arrays join in solely for the
    candidate pairs. The streaming twin with the same state shape is
    ``streaming/stateful.py``'s digest + band-member state.

    Cache lifetime: the two signature frames are persist()ed (each feeds
    a band join plus a verification lookup) and back the returned LAZY
    frame; release is the caller's job after its terminal action —
    bench.py/driver sim clearCache between queries.
    """
    bdig = batch.select(F.col(id_col), F.md5(F.col(text_col)).alias("_dg"))
    cdig = corpus.select(F.md5(F.col(text_col)).alias("_dg")).distinct()
    exact = bdig.join(cdig, "_dg", "left_semi").select(id_col)

    bsig = minhash_signatures(batch, text_col, id_col, num_perm).persist()
    csig = minhash_signatures(corpus, text_col, id_col, num_perm).persist()
    bband = bsig.select(
        F.col(id_col), F.explode(lsh_band_keys(num_perm, band_size)).alias("band")
    )
    cband = csig.select(
        F.col(id_col).alias("_cid"),
        F.explode(lsh_band_keys(num_perm, band_size)).alias("band"),
    )
    cand = (
        bband.join(cband, "band")
        .select(id_col, "_cid")
        .dropDuplicates([id_col, "_cid"])
    )
    verified = (
        cand.join(
            bsig.select(F.col(id_col), F.col("shingles").alias("_sh_n")), id_col
        )
        .join(
            csig.select(F.col(id_col).alias("_cid"), F.col("shingles").alias("_sh_c")),
            "_cid",
        )
        .withColumn(
            "_jac",
            F.size(F.array_intersect("_sh_n", "_sh_c")).cast("double")
            / F.size(F.array_union("_sh_n", "_sh_c")),
        )
        .filter(F.col("_jac") >= threshold)
        .select(id_col)
        .distinct()
    )
    is_exact = F.col("_e").isNotNull()
    is_near = F.col("_n").isNotNull()
    return (
        batch.select(id_col)
        .join(exact.withColumn("_e", F.lit(1)), id_col, "left")
        .join(verified.withColumn("_n", F.lit(1)), id_col, "left")
        .select(
            id_col,
            F.when(is_exact, F.lit("exact_dup"))
            .when(is_near, F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("verdict"),
        )
    )


def _exact_substring_runs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    L: int,
    hot_cap: int | None,
) -> DataFrame:
    """Shared matched-run frame for the ExactSubstr tiers: one row per
    maximal diagonal run of matching ``L``-char windows between a doc pair
    (id_a < id_b): (id_a, id_b, diag, a_start, run)."""
    base = (
        df.filter(F.col(text_col).isNotNull() & (F.length(text_col) >= L))
        .select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    )
    # spread docs across the cluster BEFORE the ~length(text)-row
    # generator: a handful of source files must not serialize the window
    # emission (the explode multiplies rows ~300x, so the pre-shuffle is
    # 1/300th the generated volume). r13: the old bare repartition(col)
    # was AQE-coalesced back to ONE partition on small inputs (no-count
    # repartitions are coalescable); spread() pins the explicit
    # conf-derived count so the generator actually parallelizes.
    base = spread(base, "_id")
    wins = base.select(
        "_id",
        F.explode(F.sequence(F.lit(1), F.length("_t") - F.lit(L - 1))).alias(
            "pos"
        ),
        "_t",
    ).select(
        "_id",
        "pos",
        F.substring(F.md5(F.expr(f"substring(_t, pos, {L})")), 1, 16).alias(
            "wk"
        ),
    )
    if hot_cap is not None:
        hot = (
            wins.groupBy("wk")
            .agg(F.count_distinct("_id").alias("_docs"))
            .filter(F.col("_docs") > hot_cap)
            .select("wk")
        )
        wins = wins.join(F.broadcast(hot), "wk", "left_anti")
    # persist: the self-join would otherwise regenerate + re-md5 every
    # window on BOTH sides (the generator sits below the join's exchanges,
    # so no ReusedExchange) — the same shared-intermediate pattern as the
    # persisted shingle pass in the n-gram tiers. Cache lifetime: backs
    # the returned LAZY frame; caller releases (harness clearCache)
    wins = wins.persist()
    a = wins.select(
        F.col("_id").alias("id_a"), F.col("pos").alias("pa"), "wk"
    )
    b = wins.select(
        F.col("_id").alias("id_b"), F.col("pos").alias("pb"), "wk"
    )
    m = a.join(b, "wk").filter(F.col("id_a") < F.col("id_b"))
    isl = m.select(
        "id_a",
        "id_b",
        (F.col("pa") - F.col("pb")).alias("diag"),
        "pa",
    ).withColumn(
        "grp",
        F.col("pa")
        - F.row_number().over(
            Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
        ),
    )
    return isl.groupBy("id_a", "id_b", "diag", "grp").agg(
        F.count("*").alias("run"), F.min("pa").alias("a_start")
    )


def exact_substring_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_len: int = 40,
    hot_cap: int | None = None,
) -> DataFrame:
    """EXACT long-substring cross-document dedup — the ExactSubstr half of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"); the fixed-n token-gram tier (``cross_doc_gram_share``)
    approximates what this computes exactly at character level.

    For every document pair sharing a character substring of length >=
    ``min_len``, returns (id_a, id_b, max_shared_len, shared_windows):
    the exact length of the LONGEST shared substring and how many
    ``min_len``-sized windows matched. No false positives, no misses
    (md5-keyed window equality; collisions are 2^-64-level).

    Distributed shape (the suffix-sort re-expressed as dataflow):
      1. Every position emits one ``min_len``-char window, immediately
         compressed to a 16-hex-char md5 key — the shuffle carries 16
         bytes per position, never the text, and the window→key map stays
         inside whole-stage codegen (one generator + projection, no UDF).
      2. The equi-join on window keys IS the suffix sort's "equal prefix"
         bucketing: range partitioning groups equal keys, and only
         positions whose window actually matches meet — the candidate set
         is output-bound, exactly like the banded-LSH joins.
      3. Matched positions collapse to maximal runs per (pair, diagonal)
         with the row_number-island trick: a run of r consecutive
         positions on one diagonal == a shared substring of length
         min_len + r - 1 — recovering EXACT maximal-match lengths without
         ever comparing characters again.

    Scale notes (100 TB): window emission is O(total_chars) rows of ~24
    bytes — the honest cost of exactness (Lee et al. pay it as suffix
    arrays over each shard). The join is output-bound EXCEPT for
    boilerplate substrings shared by thousands of docs (license headers):
    ``hot_cap`` drops window keys appearing in more than ``hot_cap``
    documents (the same opt-in guard as decontamination's hot-gram cap) —
    a capped run reports a LOWER BOUND on max_shared_len for the affected
    pairs, which is the standard production trade.
    """
    L = int(min_len)
    runs = _exact_substring_runs(df, text_col, id_col, L, hot_cap)
    return runs.groupBy("id_a", "id_b").agg(
        (F.max("run") + F.lit(L - 1)).cast("bigint").alias("max_shared_len"),
        F.sum("run").cast("bigint").alias("shared_windows"),
    )


def exact_substring_trim_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_len: int = 40,
    hot_cap: int | None = None,
) -> DataFrame:
    """The REMOVAL half of ExactSubstr (Lee et al. 2022 cut the duplicated
    span out of all-but-one copy): per document, the merged character
    intervals to delete so that every cross-doc substring of length >=
    ``min_len`` survives only in its LOWEST-id holder.

    Built from the same matched-run frame as :func:`exact_substring_pairs`
    (keep-lowest policy: a run between id_a < id_b marks the id_b side),
    then per-doc interval union via the sorted running-max island trick —
    overlapping/adjacent spans from DIFFERENT partners collapse to one
    interval, so the trim plan never double-counts. Output: (doc_id,
    trim_start, trim_end, span_len), 1-based inclusive character
    positions.

    Scale shape: identical to the pair tier through the window join; the
    interval merge adds one shuffle keyed on doc_id with per-doc windows
    (frames bounded by a doc's own span count).
    """
    L = int(min_len)
    runs = _exact_substring_runs(df, text_col, id_col, L, hot_cap)
    spans = runs.select(
        F.col("id_b").alias("doc_id"),
        (F.col("a_start") - F.col("diag")).alias("s"),
        (F.col("a_start") - F.col("diag") + F.col("run") + F.lit(L - 2)).alias(
            "e"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.withColumn(
        "_new_isl",
        F.when(
            prev_max.isNull() | (F.col("s") > prev_max + 1), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn("_isl", F.sum("_new_isl").over(w))
    return (
        flagged.groupBy("doc_id", "_isl")
        .agg(F.min("s").alias("trim_start"), F.max("e").alias("trim_end"))
        .select(
            "doc_id",
            F.col("trim_start").cast("bigint").alias("trim_start"),
            F.col("trim_end").cast("bigint").alias("trim_end"),
            (F.col("trim_end") - F.col("trim_start") + 1)
            .cast("bigint")
            .alias("span_len"),
        )
    )


def fuzzy_match_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 1,
    q: int = 2,
) -> DataFrame:
    """Entity-resolution near matches: all pairs within Levenshtein
    distance ``max_dist`` — the Ed-Join shape (Xiao et al. 2008, VLDB)
    re-expressed as dataflow:

      1. q-gram MULTISET elements: each occurrence is its own element
         ``(gram, occ)`` (occ = occurrence index within the string), so
         set intersection of elements equals the multiset common count
         ``sum(min(ca, cb))`` the count-filter bound speaks about;
      2. PREFIX FILTER: a pair within distance d shares
         t = max(la, lb) - (q-1) - d*q elements, so under ANY global
         total order the first ``|G| - t + 1 <= d*q + 1`` elements of
         each string must already intersect — join only those. The
         order used is (global element frequency ASC, gram, occ):
         rarity-first makes the surviving prefixes the DISTINGUISHING
         substrings, which collapses the hot-gram blowup (a shared
         constant prefix like "Supplier#" contributes sum df(g)^2
         candidate rows under a full inverted join — ~10M rows for 1k
         supplier names — but its elements are frequent, so they never
         enter a rarity-first prefix). Plus the length filter
         |la - lb| <= d;
      3. exact ``levenshtein`` verification on the surviving candidates
         only — zero false positives.

    No-miss guarantee holds for strings longer than (d+1)*q - 1 chars
    (exactly the domain where t >= 1; shorter strings can lose every
    shared gram to the edits — same caveat as the plain count filter;
    the registered query's 18-char keys clear this by 4x). Output:
    (id_a, id_b, edit_distance), id_a < id_b.

    Scale: candidate volume drops from sum over ALL grams of df(g)^2 to
    the same sum over each string's d*q+1 RAREST elements — the Ed-Join
    result that prefix filtering, not candidate counting, is what makes
    string joins feasible at corpus scale. r10 measurement (sf0.1
    supplier names, fresh JVM, steady state): 2.8-2.9 s -> ~1.1 s.
    """
    d = int(max_dist)
    prefix_len = d * q + 1
    # r13: spread before the per-position q-gram transform+explode
    # (functions/partitioning.spread — scan partitions must not serialize
    # the gram generator)
    base = spread(
        df.filter(
            F.col(text_col).isNotNull() & (F.length(text_col) >= q)
        ).select(
            F.col(id_col).alias("_id"),
            F.col(text_col).alias("_t"),
            F.length(text_col).alias("_len"),
        ),
        "_id",
    )
    # (gram, occ) elements: groupBy-count then re-expand occurrence
    # indices — one shuffle on (_id, gram), no per-position window
    counted = (
        base.select(
            "_id",
            "_len",
            F.explode(
                F.expr(
                    f"transform(sequence(1, _len - {q - 1}),"
                    f" p -> substring(_t, p, {q}))"
                )
            ).alias("gram"),
        )
        .groupBy("_id", "_len", "gram")
        .agg(F.count("*").alias("c"))
    )
    elements = counted.select(
        "_id",
        "_len",
        "gram",
        F.explode(F.expr("sequence(1, c)")).alias("occ"),
    )
    # global element frequency = #strings with >= occ occurrences of gram
    freq = elements.groupBy("gram", "occ").agg(F.count("*").alias("_df"))
    w = Window.partitionBy("_id").orderBy("_df", "gram", "occ")
    prefix = (
        elements.join(freq, ["gram", "occ"])
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= prefix_len)
        .select("_id", "_len", "gram", "occ")
    )
    a = prefix.select(
        F.col("_id").alias("id_a"), F.col("_len").alias("la"), "gram", "occ"
    )
    b = prefix.select(
        F.col("_id").alias("id_b"), F.col("_len").alias("lb"), "gram", "occ"
    )
    cand = (
        a.join(b, ["gram", "occ"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("la") - F.col("lb")) <= d)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    s1 = base.select(F.col("_id").alias("id_a"), F.col("_t").alias("_ta"))
    s2 = base.select(F.col("_id").alias("id_b"), F.col("_t").alias("_tb"))
    return (
        cand.join(s1, "id_a")
        .join(s2, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("_ta", "_tb").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= d)
    )


def doc_spans(
    df: DataFrame, text_col: str, id_col: str, span_words: int = 10
) -> DataFrame:
    """Segment each document into consecutive non-overlapping
    ``span_words``-word spans: (id, span_no, span_text, span_hash).

    The unit for CORPUS-LEVEL span dedup (CCNet's paragraph dedup /
    C4's repeated-span removal, Wenzek et al. 2019 §4.2; reference has no
    dedup at all — engine extension): on real crawls the segmenter is the
    newline/sentence splitter; this corpus is single-line word soup, so
    the word-window segmenter stands in — the downstream machinery
    (hash -> first-occurrence -> trim) is segmenter-agnostic.

    Array-level build: token slices via one ``transform`` over a span
    index sequence (no explode until the final span table), so the heavy
    string work stays inside one narrow projection.
    """
    # r13: spread before the tokenize + per-span slice/join transform
    # (functions/partitioning.spread)
    base = spread(df.select(F.col(id_col), F.col(text_col)), id_col).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).filter(F.size("_toks") > 0)
    spans = base.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, (size(_toks)-1) div {span_words}),"
                f" i -> array_join(slice(_toks, i*{span_words}+1,"
                f" {span_words}), ' '))"
            )
        ).alias("span_no", "span_text"),
    )
    return spans.withColumn("span_hash", F.md5("span_text"))


def span_dedup_stats(
    df: DataFrame, text_col: str, id_col: str, span_words: int = 10
) -> DataFrame:
    """Per-document duplication profile under corpus-level span dedup:
    a span is DUPLICATE iff an identical span (same ``span_words``-word
    text) occurs earlier in the corpus order (first occurrence = min
    (doc_id, span_no) — deterministic, engine-independent). Returns
    (id, n_spans, dup_spans, dup_frac); the kept corpus drops exactly
    the dup spans (CCNet keeps one copy of every repeated paragraph).

    Scale shape: one shuffle keyed on span_hash for the first-occurrence
    argmin (min over a (doc, span) struct — map-side combinable), then a
    hash-keyed join back (co-partitioned with the agg, no broadcast
    needed at any corpus size), then a doc-keyed count. Nothing is
    all-pairs; state per distinct span is one struct.
    """
    spans = doc_spans(df, text_col, id_col, span_words)
    firsts = spans.groupBy("span_hash").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("span_no").alias("s"))).alias("_first")
    )
    joined = spans.join(firsts, "span_hash")
    is_dup = ~(
        (F.col(id_col) == F.col("_first.d"))
        & (F.col("span_no") == F.col("_first.s"))
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(is_dup.cast("long")).alias("dup_spans"),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("dup_spans") / F.col("n_spans"), 6),
        )
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_words: int = 10,
    min_count: int = 2,
    k: int = 20,
) -> DataFrame:
    """The corpus's most-repeated spans: (span_text, n_occurrences,
    n_docs) for spans occurring >= ``min_count`` times, top-``k`` by
    (occurrences desc, span_text asc — total order). The boilerplate
    inspection view next to ``span_dedup_stats``'s per-doc numbers.
    """
    spans = doc_spans(df, text_col, id_col, span_words)
    return (
        spans.groupBy("span_text")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= min_count)
        .orderBy(F.desc("n_occurrences"), F.asc("span_text"))
        .limit(k)
    )


def normalized_dedup_groups(
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Exact dedup over NORMALIZED text (lowercase, punctuation -> space,
    whitespace squeezed, trimmed): catches the trivial-variant duplicates
    — casing, stray punctuation, spacing — that a raw digest misses
    (the Dolma-style "normalized hash" dedup class between exact and
    fuzzy). Returns one row per normalized group:
    (norm_hash, keep_id, dup_count, raw_variants) where raw_variants is
    the number of DISTINCT raw texts the group collapses (>1 means
    normalization did work a raw digest could not).

    Scale shape: identical to exact dedup — the normalization is a pure
    codegen projection ahead of one digest-keyed aggregate."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.md5(norm).alias("norm_hash"),
            F.col(id_col),
            F.md5(F.col(text_col)).alias("_raw"),
        )
        .groupBy("norm_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
            F.countDistinct("_raw").alias("raw_variants"),
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_keys: dict[str, Column],
    window: int,
) -> DataFrame:
    """Multi-pass Sorted Neighborhood (Hernandez & Stolfo 1995) candidate
    generation: per pass, rank all records by that pass's sort key and
    emit every pair at rank distance <= ``window``; union the passes and
    de-duplicate. The complement of the q-gram blocking family
    (``fuzzy_match_pairs``): SNM finds whatever the sort keys make
    adjacent — recall depends on key design (hence multiple passes, e.g.
    the string and its reverse), and the eval query MEASURES that recall
    against the q-gram truth instead of assuming it.

    Scale shape: the global rank comes from
    ``windows.range_partitioned_running_sum`` over a constant-1 column —
    repartitionByRange + bounded per-slice sidecar + intra-slice window,
    NEVER a single-partition global window. Neighbor pairs are then a
    BANDED equi-join: each record keys on block ``(rank-1) div window``;
    the probe side carries a block-shifted copy so same-block and
    adjacent-block pairs are both found by pure equi-joins (a pair at
    rank distance <= window cannot span more than one block boundary).
    Per pass: one range shuffle + one equi-join keyed on dense integer
    blocks — no sort-merge over the whole corpus, no O(n*w) window
    explode.

    Output: (id_a, id_b) with id_a < id_b, distinct across passes.
    """
    from .windows import range_partitioned_running_sum_batch

    # r14 (guide §2.6): every pass ran its own EAGER bounded sidecar
    # collect (serialized driver round-trips — one per sort key); the
    # batch operator fetches all passes' slice maps in ONE action.
    # Per-pass ranks are identical to the single-pass operator.
    ranked_passes = range_partitioned_running_sum_batch(
        [
            (
                df.select(F.col(id_col).alias("_id"), key.alias("_k"))
                .withColumn("_one", F.lit(1)),
                [F.col("_k"), F.col("_id")],
                "_one",
            )
            for key in sort_keys.values()
        ]
    )
    all_pairs: DataFrame | None = None
    for run in ranked_passes:
        ranked = run.select(
            F.col("_id"),
            F.col("running__one").alias("_rnk"),
            F.expr(f"(running__one - 1) div {window}").alias("_blk"),
        )
        probe = ranked.unionByName(
            ranked.withColumn("_blk", F.col("_blk") - 1)
        )
        a, b = ranked.alias("a"), probe.alias("b")
        pairs = (
            a.join(b, F.col("a._blk") == F.col("b._blk"))
            .filter(
                (F.col("b._rnk") > F.col("a._rnk"))
                & (F.col("b._rnk") <= F.col("a._rnk") + window)
            )
            .select(
                F.least(F.col("a._id"), F.col("b._id")).alias("id_a"),
                F.greatest(F.col("a._id"), F.col("b._id")).alias("id_b"),
            )
        )
        all_pairs = pairs if all_pairs is None else all_pairs.unionByName(pairs)
    assert all_pairs is not None, "sort_keys must be non-empty"
    return all_pairs.distinct()


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.6,
    num_perm: int = NUM_PERM,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """Asymmetric near-dup pairs by shingle CONTAINMENT
    ``|A ∩ B| / min(|A|, |B|)`` — the quote/excerpt detector: a short doc
    embedded verbatim in a long one scores containment ~1 while its
    symmetric Jaccard (inter/union) stays low and slips under every
    Jaccard threshold. Returns (id_a < id_b, jaccard, containment) for
    banded candidates with containment >= threshold; both metrics ride
    along so the caller can see exactly which pairs Jaccard would have
    missed.

    Scale shape: identical to ``minhash_lsh_pairs`` — sign once, skinny
    band self-join, shingles joined back for candidates only. (Banding
    recall is tuned to Jaccard; heavily size-skewed containment pairs
    collide less often — the documented residual of reusing one index
    for both metrics.)"""
    # persist: sigs feeds band generation + two verification joins in ONE
    # downstream action. Unpersisting inside this lazy builder would drop
    # the CacheManager entry before the caller's action plans, silently
    # disabling the reuse — lifetime is instead bounded by the harness
    # contract (per-query spark.catalog.clearCache(), bench.py) and LRU
    # eviction under the unified memory manager (ADVICE r8 adjudication).
    sigs = minhash_signatures(df, text_col, id_col, num_perm).persist()
    bands = sigs.select(
        F.col(id_col),
        F.explode(lsh_band_keys(num_perm, band_size)).alias("band"),
    )
    cand = (
        bands.select(F.col(id_col).alias("id_a"), "band")
        .join(bands.select(F.col(id_col).alias("id_b"), "band"), "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sets = sigs.select(F.col(id_col), "shingles")
    cand = (
        cand.join(
            sets.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")),
            "id_a",
        )
        .join(
            sets.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    jac = inter / F.size(F.array_union("sh_a", "sh_b"))
    cont = inter / F.least(F.size("sh_a"), F.size("sh_b"))
    return (
        cand.select(
            "id_a", "id_b", jac.alias("jaccard"), cont.alias("containment")
        )
        .filter(F.col("containment") >= threshold)
    )
