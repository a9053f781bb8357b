"""Corpus sampling + contamination audit — the selection ops a training-data
pipeline runs after cleaning/dedup: draw a deterministic stratified sample,
cap each partition at a token budget, and audit train/test n-gram leakage.

All three are hash-deterministic (md5 over ids), so results are stable
across engines, reruns, and repartitions — the property that makes sampling
decisions reproducible and eval-set leakage checks trustworthy — and a
DuckDB oracle replays each op bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count, tokens, word_shingles


def _hex_threshold(rate: float) -> str:
    """2-hex-char keep threshold for a sampling rate: a row survives when
    ``substr(md5(id), 1, 2) < threshold``. Fixed-width lowercase hex compares
    lexicographically == numerically, so the whole test stays a string
    comparison (portable to any SQL engine, no hex->int cast). rate >= 1.0
    maps to 'zz', which every hex pair sorts below."""
    if rate >= 1.0:
        return "zz"
    return format(max(int(rate * 256), 0), "02x")


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff the first two
    hex chars of md5(id) fall below the stratum's rate threshold.

    The training-data mixture knob (e.g. keep 100% of books, 25% of web):
    content-independent, stable as the corpus grows, and reproducible —
    rerunning on a superset keeps exactly the previously kept ids, so
    incremental pipeline runs never churn the sample. Pure expression over
    the scan: no shuffle, no RNG state, embarrassingly parallel at 100 TB.
    """
    h2 = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    thr = F.lit(_hex_threshold(default_rate))
    for k, r in rates.items():
        thr = F.when(F.col(strata_col) == k, F.lit(_hex_threshold(r))).otherwise(thr)
    return df.filter(h2 < thr)


def token_budget_sample(
    df: DataFrame,
    text_col: str,
    id_col: str,
    part_col: str,
    budget: int,
) -> DataFrame:
    """Cap each partition (e.g. language) at ``budget`` tokens: docs are
    taken in md5(id) order (a deterministic shuffle) until the budget fills;
    the doc whose running-total START offset still fits is kept whole.

    Output: (id, partition, n_tokens) for kept docs. The running sum is a
    per-partition ordered window — partitions pack independently, so the
    1000-executor shape is one shuffle on ``part_col`` and a linear pass per
    partition (same scale shape as sharded sequence packing). md5 ordering
    makes the kept set a uniform sample of each partition rather than
    whatever order the files arrived in.
    """
    sized = df.select(
        F.col(id_col),
        F.col(part_col),
        token_count(text_col).alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("_h"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy(part_col)
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        sized.withColumn("_start", start.cast("long"))
        .filter(F.col("_start") < budget)
        .select(id_col, part_col, "n_tokens")
    )


def mixture_epochs(
    df: DataFrame,
    strata_col: str,
    epochs: dict[str, int],
    default_epochs: int = 1,
) -> DataFrame:
    """Epoch-weighted mixture replication: each row is repeated its
    stratum's epoch count, with an ``epoch`` column (1..n) distinguishing
    the copies — the upsampling half of data mixing (stratified_sample is
    the downsampling half; a mixture spec uses both: rates for <1x,
    epochs for >=1x).

    Pure explode(sequence) on the scan — map-only, no shuffle, no RNG; a
    stratum with 0 epochs vanishes. At 100 TB you'd fold the epoch column
    into the dataloader order rather than materializing copies, but the
    logical transform (and its cost model: output rows = Σ docs·epochs) is
    exactly this.
    """
    n = F.lit(default_epochs)
    for k, e in epochs.items():
        n = F.when(F.col(strata_col) == k, F.lit(int(e))).otherwise(n)
    seq = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("epoch", F.explode(seq))


def ngram_overlap(
    left: DataFrame,
    right: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    max_right_df: int | None = None,
) -> DataFrame:
    """Per-left-document n-gram overlap against the whole right corpus:
    (id, shared_grams, right_docs) for every left doc sharing at least one
    distinct word n-gram with any right doc.

    The decontamination primitive (does a training doc leak an eval doc?):
    shingle both sides once, explode to skinny (id, gram) rows, inverted-
    index equi-join on the gram, two COUNT DISTINCTs per left doc. At n=5
    grams are near-unique, so df(g) stays tiny and the join output is
    ~true-overlap-sized — the same sparse-corpus regime where the inverted
    n-gram plan wins (see dedup.ngram_jaccard_pairs' cost model).

    ``max_right_df`` is the hot-gram guard for real corpora: a boilerplate
    gram appearing in k right docs multiplies the join output by k for
    every left doc containing it (the Σ df(g)² blowup, measured 51x at 10x
    in SCALE.md). Grams with right-side document frequency above the cap
    are dropped BEFORE the join — semantically, license headers and
    navigation chrome shared by many eval docs are not evidence of leakage,
    so the cap is a precision improvement as well as the scale guard.
    """
    lg = left.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("gram")
    )
    rg = right.select(
        F.col(id_col).alias("_rid"), F.explode(word_shingles(text_col, n)).alias("gram")
    )
    if max_right_df is not None:
        keep = (
            rg.groupBy("gram")
            .agg(F.countDistinct("_rid").alias("_df"))
            .filter(F.col("_df") <= max_right_df)
            .select("gram")
        )
        rg = rg.join(keep, "gram")
    return lg.join(rg, "gram").groupBy(id_col).agg(
        F.countDistinct("gram").alias("shared_grams"),
        F.countDistinct("_rid").alias("right_docs"),
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int = 16,
    seed: str = "epoch0",
) -> DataFrame:
    """Deterministic global shuffle + sharding for training-data ordering:
    every row gets a ``shard`` in [0, n_shards) and a dense ``pos`` within
    its shard, both pure functions of (seed, id).

    Training runs need the corpus in a reproducible pseudo-random order
    (and re-shuffled per epoch by changing the seed) without a global sort:
    hash the id with the seed, take the hash's low bits as the shard, and
    rank by the full hash within each shard. The only exchange is the
    shard-keyed window rank — n_shards independent sorts of |corpus|/n_shards
    rows each, which is exactly the per-output-file sort a shard writer does
    anyway; there is no single global ordering bottleneck. Ties are
    impossible (the id is appended to the sort key).

    At 100 TB you'd pick n_shards ~ output-file count (tens of thousands);
    each window partition then fits one task and the plan is a single
    hash-exchange + per-partition sort, the minimum any deterministic
    permutation needs.
    """
    h = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    # 15 hex chars = 60 bits: fits a signed 64-bit int, always positive
    hval = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    w = (
        Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    )
    return (
        df.withColumn("_h", hval)
        .withColumn("shard", (F.col("_h") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("_h")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis, IPL 2006): each row draws u in (0,1) from md5(salt:id) and
    scores key = u^(1/w); the k largest keys are the sample, equivalent in
    distribution to sequential weighted draws without replacement.

    Determinism: u is a pure hash (no RNG state), so the same corpus
    always yields the same sample — replayable by any engine with md5.
    Scale shape: one scan computing (key) + TakeOrderedAndProject(k); no
    shuffle beyond the top-k reduction, works unchanged on 10^12 rows.
    Rows with NULL or non-positive weight are excluded (u^(1/w) is
    undefined there and such rows carry no sampling mass).
    """
    w = F.col(weight_col).cast("double")
    h = F.expr(
        f"cast(conv(substring(md5(concat('{salt}:', cast(`{id_col}` as string))), 1, 8), 16, 10) AS BIGINT)"
    )
    u = (h + F.lit(1.0)) / F.lit(float(2**32 + 1))
    key = F.pow(u, F.lit(1.0) / w)
    return (
        df.filter(w.isNotNull() & (w > 0))
        .select(F.col(id_col), F.col(weight_col), key.alias("_raw_key"))
        .orderBy(F.desc("_raw_key"), F.asc(id_col))
        .limit(k)
        # selection/order use the raw key; the REPORTED key is rounded so
        # the comparison surface tolerates last-ulp pow() differences
        # across engines/libms
        .select(
            F.col(id_col),
            F.col(weight_col),
            F.round("_raw_key", 6).alias("sample_key"),
        )
    )


def dsir_log_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    is_target,
    n_buckets: int = 64,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance log-weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023) over hashed
    unigram features.

    Fits two bucket multinomials — the target slice (``is_target`` boolean
    Column, e.g. a curated-domain flag) and the whole corpus — with
    add-``alpha`` smoothing, then scores every document with
    ``logw(d) = sum_b n_db * (ln p_target[b] - ln p_corpus[b])``: how much
    more target-like than corpus-like the document's token mass is.

    Scale shape: one tokenize+explode scan; per-doc bucket counts are a
    combinable (id, bucket)-keyed aggregate (<= n_buckets rows per doc out
    of the map-side combine); the fitted model is a ``n_buckets``-row frame
    broadcast back — no collect, no driver-side model state, and the big
    shuffle is bounded by docs x n_buckets regardless of document length.
    Hash-deterministic (md5 bucketing), so a DuckDB oracle replays it
    bit-for-bit.

    Returns (id_col, dsir_logw<double>) for every non-NULL-text document.
    """
    toks = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        is_target.alias("_tgt"),
        F.explode(tokens(text_col)).alias("_term"),
    )
    bucketed = toks.select(
        F.col(id_col),
        F.col("_tgt"),
        F.pmod(
            F.conv(F.substring(F.md5("_term"), 1, 4), 16, 10).cast("long"),
            F.lit(n_buckets),
        ).alias("_b"),
    )
    doc_b = bucketed.groupBy(id_col, "_b").agg(F.count("*").alias("_n"))
    corpus = bucketed.groupBy("_b").agg(
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).cast("long").alias("_ct"),
        F.count("*").alias("_cr"),
    )
    totals = corpus.agg(
        F.sum("_ct").cast("double").alias("_t_tot"),
        F.sum("_cr").cast("double").alias("_r_tot"),
    )
    a, ab = float(alpha), float(alpha * n_buckets)
    ratio = corpus.crossJoin(F.broadcast(totals)).select(
        "_b",
        "_ct",
        "_cr",
        (
            F.log((F.col("_ct") + F.lit(a)) / (F.col("_t_tot") + F.lit(ab)))
            - F.log((F.col("_cr") + F.lit(a)) / (F.col("_r_tot") + F.lit(ab)))
        ).alias("_lr"),
    )
    return (
        doc_b.join(F.broadcast(ratio.select("_b", "_lr")), "_b")
        .groupBy(id_col)
        .agg(F.sum(F.col("_n") * F.col("_lr")).alias("dsir_logw"))
    )


def dsir_bucket_counts(
    df: DataFrame,
    text_col: str,
    is_target,
    n_buckets: int = 64,
) -> DataFrame:
    """Raw DSIR bucket counters (bucket, n_target_tokens, n_corpus_tokens):
    one tokenize+explode scan into a combinable ``n_buckets``-row
    aggregate. This is the ADDITIVE state of the DSIR model — counts over
    a union of corpora are the sum of per-corpus counts — so the model can
    be maintained incrementally under streaming ingest with the generic
    ``foreach_batch_incremental_agg`` sink (the log-ratio is a pure
    function of the merged counters, recomputed on read)."""
    toks = df.filter(F.col(text_col).isNotNull()).select(
        is_target.alias("_tgt"), F.explode(tokens(text_col)).alias("_term")
    )
    return (
        toks.select(
            F.col("_tgt"),
            F.pmod(
                F.conv(F.substring(F.md5("_term"), 1, 4), 16, 10).cast("long"),
                F.lit(n_buckets),
            ).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_tgt"), 1).otherwise(0))
            .cast("long")
            .alias("n_target_tokens"),
            F.count("*").alias("n_corpus_tokens"),
        )
    )


def dsir_bucket_model(
    df: DataFrame,
    text_col: str,
    is_target,
    n_buckets: int = 64,
    alpha: float = 1.0,
) -> DataFrame:
    """The fitted DSIR bucket table itself (diagnostic view of
    :func:`dsir_log_weights`): per hashed-unigram bucket, target-slice and
    whole-corpus token counts plus the smoothed log-probability ratio.
    ``n_buckets`` rows total — the 'model' a DSIR run would persist."""
    corpus = dsir_bucket_counts(df, text_col, is_target, n_buckets)
    totals = corpus.agg(
        F.sum("n_target_tokens").cast("double").alias("_t_tot"),
        F.sum("n_corpus_tokens").cast("double").alias("_r_tot"),
    )
    a, ab = float(alpha), float(alpha * n_buckets)
    return corpus.crossJoin(F.broadcast(totals)).select(
        "bucket",
        "n_target_tokens",
        "n_corpus_tokens",
        F.round(
            F.log(
                (F.col("n_target_tokens") + F.lit(a)) / (F.col("_t_tot") + F.lit(ab))
            )
            - F.log(
                (F.col("n_corpus_tokens") + F.lit(a)) / (F.col("_r_tot") + F.lit(ab))
            ),
            6,
        ).alias("log_ratio"),
    )


def dsir_resample(
    weights: DataFrame,
    id_col: str,
    k: int,
    logw_col: str = "dsir_logw",
    salt: str = "dsir",
) -> DataFrame:
    """Gumbel top-k resampling over DSIR log-weights: sampling WITHOUT
    replacement proportional to ``exp(logw)`` reduces to taking the k
    largest ``logw + Gumbel(0,1)`` keys. The Gumbel draw is deterministic —
    ``u = (md5int(salt:id)+1) / (2^32+1)``, ``g = -ln(-ln u)`` — so the
    selected set is reproducible across engines and reruns, like
    :func:`weighted_sample`'s Efraimidis-Spirakis keys.

    One scan + TakeOrderedAndProject(k): no shuffle beyond the top-k
    reduction. Reported logw is rounded to 1e-6 to tolerate last-ulp libm
    differences; selection uses the raw key (gumbel noise spreads keys, so
    boundary flips need a ~1e-15 coincidence).
    """
    h = F.expr(
        f"cast(conv(substring(md5(concat('{salt}:', cast(`{id_col}` as string))), "
        "1, 8), 16, 10) AS BIGINT)"
    )
    u = (h + F.lit(1.0)) / F.lit(float(2**32 + 1))
    key = F.col(logw_col) + -F.log(-F.log(u))
    return (
        weights.select(F.col(id_col), F.col(logw_col), key.alias("_key"))
        .orderBy(F.desc("_key"), F.asc(id_col))
        .limit(k)
        .select(F.col(id_col), F.round(logw_col, 6).alias(logw_col))
    )


def temperature_targets(
    sizes: DataFrame,
    key_col: str,
    size_col: str,
    k_total: int,
    alpha: float = 0.5,
    scale: int = 1_000_000,
) -> DataFrame:
    """Temperature-based mixture apportionment (the multilingual/multi-
    source sampling rule of XLM/mT5: draw probability proportional to
    ``size^alpha``, flattening the head so small sources are not drowned):
    given per-key integer sizes, allocate exactly ``k_total`` draws via
    LARGEST-REMAINDER rounding over integer weights.

    Engine-exact by construction: ``weight = round(size^alpha * scale)``
    is one exactly-rounded IEEE op chain per key (sqrt at alpha=0.5), and
    everything downstream — total, quota ``(k*w) // W``, remainders, the
    leftover ranking — is pure integer arithmetic, so targets replay
    bit-for-bit in any engine and under any partitioning. The ranking
    window is global but runs over the KEY dimension (sources/languages —
    bounded by definition, like the limit(n) frames elsewhere).

    Overflow bound: needs ``k_total * weight < 2^63`` — holds through
    k_total ~ 1e6 slots against 1e12-token sources at the default scale.

    Returns (key_col, size_col, weight, target_k).
    """
    w = (
        F.round(F.pow(F.col(size_col).cast("double"), F.lit(alpha)) * scale)
        if alpha != 0.5
        else F.round(F.sqrt(F.col(size_col).cast("double")) * scale)
    )
    weighted = sizes.select(
        key_col, size_col, w.cast("long").alias("weight")
    )
    tot = weighted.agg(
        F.sum("weight").alias("_w_tot"),
    )
    quota = (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            key_col,
            size_col,
            "weight",
            # true integral division (not double-divide-then-truncate):
            # keeps the quota arithmetic exact at any magnitude
            F.expr(f"({k_total} * weight) div _w_tot").alias("_base"),
            ((F.lit(k_total) * F.col("weight")) % F.col("_w_tot"))
            .alias("_rem"),
        )
    )
    base_tot = quota.agg(F.sum("_base").alias("_b_tot"))
    ranked = quota.crossJoin(F.broadcast(base_tot)).withColumn(
        "_rank",
        F.row_number().over(
            Window.orderBy(F.desc("_rem"), F.asc(key_col))
        ),
    )
    return ranked.select(
        key_col,
        size_col,
        "weight",
        (
            F.col("_base")
            + F.when(
                F.col("_rank") <= F.lit(k_total) - F.col("_b_tot"), 1
            ).otherwise(0)
        ).alias("target_k"),
    )


def temperature_mixture_sample(
    df: DataFrame,
    key_col: str,
    targets: DataFrame,
    id_col: str,
    seed: str = "tmix",
) -> DataFrame:
    """Draw each key's ``target_k`` rows deterministically: md5(seed, id)
    ranks rows within their key; the first ``target_k`` survive (all rows
    when the key is smaller than its quota). Broadcast the (tiny) target
    table; one per-key window, no global sort."""
    order = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    rn = F.row_number().over(
        Window.partitionBy(key_col).orderBy(order, F.col(id_col))
    )
    return (
        df.join(F.broadcast(targets.select(key_col, "target_k")), key_col)
        .withColumn("_rn", rn)
        .filter(F.col("_rn") <= F.col("target_k"))
        .select(id_col, key_col)
    )
