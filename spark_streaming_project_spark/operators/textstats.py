"""Text-analysis operators: per-document stats, quality scoring, language ID,
fingerprinting (BASELINE.json north-star). All array-level built-ins — one
narrow pass over the corpus, no shuffle until the caller aggregates."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.partitioning import spread
from ..functions.text import (
    bpe_token_count,
    predict_lang,
    rolling_fingerprint,
    token_count,
    tokens,
    word_ngrams,
)


def doc_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document lexical statistics + a [0,1] quality score.

    quality = 0.4 * type_token_ratio
            + 0.3 * min(token_count/100, 1)
            + 0.3 * (1 - min(avg_token_len/10, 1))
    (A heuristic in the spirit of C4/Gopher length-and-diversity rules.)
    """
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    ttr = n_distinct.cast("double") / n_tokens
    len_score = F.least(n_tokens.cast("double") / 100.0, F.lit(1.0))
    avg_len = total_len.cast("double") / n_tokens
    brevity = 1.0 - F.least(avg_len / 10.0, F.lit(1.0))
    # r13: spread before the 4 tokenize/fold passes (functions/partitioning)
    df = spread(df.select(F.col(id_col), F.col(text_col)), id_col)
    return df.filter(F.size(toks) > 0).select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(0.4 * ttr + 0.3 * len_score + 0.3 * brevity, 6).alias("quality"),
    )


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-profile language prediction per document.

    Tokenizes once into a column, then scores each profile over it (the
    naive form re-splits the text once per language profile — 4x the array
    passes; HOF lambdas are interpreted, so passes dominate).
    """
    from ..functions.text import LANG_PROFILES

    # r13: spread before the tokenize + 4 profile-score passes
    toksed = spread(df.select(F.col(id_col), F.col(text_col)), id_col).select(
        F.col(id_col), F.col(text_col).alias("_text")
    ).withColumn("_toks", F.expr(r"filter(split(_text, '\\s+'), t -> t <> '')"))
    score_cols = [
        F.expr(
            "size(filter(_toks, t -> lower(t) IN ({})))".format(
                ", ".join(f"'{w}'" for w in words)
            )
        ).alias(f"s_{lang}")
        for lang, words in LANG_PROFILES.items()
    ]
    scores = toksed.select(F.col(id_col), *score_cols)
    return scores.select(
        F.col(id_col),
        F.expr(
            """
            CASE WHEN greatest(s_en, s_fr, s_de, s_es) = 0 THEN 'und'
                 WHEN s_en = greatest(s_en, s_fr, s_de, s_es) THEN 'en'
                 WHEN s_fr = greatest(s_fr, s_de, s_es) THEN 'fr'
                 WHEN s_de = greatest(s_de, s_es) THEN 'de'
                 ELSE 'es' END
            """
        ).alias("predicted_lang"),
    )


def fingerprints(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint + BPE-ish token count."""
    # r13: spread before the rolling-hash fold (functions/partitioning)
    df = spread(df.select(F.col(id_col), F.col(text_col)), id_col)
    return df.select(
        F.col(id_col),
        rolling_fingerprint(text_col).alias("fingerprint"),
        token_count(text_col).alias("ws_tokens"),
        bpe_token_count(text_col).alias("bpe_tokens"),
    )


#: Winnowing position-encoding radix: positions are packed into the low 20
#: bits of the selection key, so per-document gram counts must stay below
#: 2^20 (a ~1M-token document; far above any chunked training doc).
_WINNOW_POS_RADIX = 1 << 20


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    w: int = 4,
    hash_hex: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word ``k``-gram, slide a
    ``w``-wide window over consecutive positions, and in each window select
    the minimum hash, breaking ties toward the RIGHTMOST position. The
    selected (position, hash) set is the document's fingerprint: any two
    documents sharing a run of at least ``w + k - 1`` tokens are GUARANTEED
    to share a fingerprint, while only ~2/(w+1) of all grams are kept.

    Engine-replayable selection without a nested argmin: each position
    packs ``hash * 2^20 + (2^20 - 1 - pos)`` into one BIGINT key, so a
    plain ``array_min`` over each w-slice IS min-hash with rightmost
    tie-break; the winner is decoded back with integer div/mod. The whole
    selection is ARRAY-LEVEL per document — no window, NO SHUFFLE at all
    (winnowing never crosses documents), which also makes the operator
    streaming-composable (see ``streaming.stateful.
    streaming_winnow_candidates``); the only generate is the final
    explode of the selected set. The DuckDB oracle states the same math
    as a windowed min over exploded positions — two formulations, one
    selection.

    Returns distinct (id_col, pos, fp) — fp an md5-derived ``4 * hash_hex``
    -bit value (16-bit default: compact per-doc digests; pass
    ``hash_hex=8`` for 32-bit fingerprints when MATCHING across documents,
    where 16-bit collisions would fabricate candidates), pos the 1-based
    gram position. Documents with fewer than ``w + k - 1`` tokens produce
    no fingerprints (below the guarantee threshold).
    """
    R = _WINNOW_POS_RADIX

    def _keys(grams):
        return F.transform(
            grams,
            lambda g, i: F.conv(F.substring(F.md5(g), 1, hash_hex), 16, 10)
            .cast("long")
            * R
            + (F.lit(R - 1) - (i + 1)),
        )

    # sliding minima as a least-fold over w shifted views of the key
    # array (word_ngrams' shift-and-zip trick): w-1 zip_with passes, no
    # per-position slice allocation. The distinct window minima ARE the
    # selected packed keys.
    def _mins(ks):
        width = F.greatest(F.size(ks) - (w - 1), F.lit(0))
        m = F.slice(ks, 1, width)
        for t in range(1, w):
            m = F.zip_with(
                m, F.slice(ks, t + 1, width), lambda a, b: F.least(a, b)
            )
        return F.array_distinct(m)

    # The min-fold references the key array w+1 times and the key build
    # references the gram array twice; with plain chained selects Catalyst
    # COLLAPSES the projections and re-evaluates the interpreted HOF
    # chains once per reference (measured 10x at 10x scale). let() binds
    # each intermediate once — expression-level let-binding
    # (functions/vectors.let).
    from ..functions.vectors import let

    # r13: spread before the gram/key/min HOF chain — the heaviest
    # per-doc array pipeline in the text family (functions/partitioning)
    sel = spread(
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.col(text_col)),
        id_col,
    ).select(
        F.col(id_col),
        let(
            word_ngrams(text_col, n=k),
            lambda grams: let(_keys(grams), _mins),
        ).alias("_sel"),
    )
    return sel.select(
        F.col(id_col), F.explode("_sel").alias("_s")
    ).select(
        id_col,
        # integral div: exact whatever the hash width (double division
        # would lose bits past 2^53)
        (F.lit(R - 1) - F.col("_s") % R).alias("pos"),
        F.expr(f"_s div {R}").alias("fp"),
    )


def winnow_match_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """Winnowing-based near-dup candidates (the MOSS matching step):
    documents sharing >= ``min_shared`` distinct 32-bit winnowed
    fingerprints. Inverted-index shape — fingerprint -> doc list ->
    within-bucket pairs — with the standard MOSS mitigation for common
    content: fingerprints selected by more than ``max_df`` documents are
    STOP-LISTED before pairing (they signal boilerplate, not copying, and
    at 100 TB one hot fingerprint would otherwise emit df^2/2 pairs).
    Returns (id_a, id_b, shared_fps), id_a < id_b.
    """
    fps = (
        winnow_fingerprints(df, text_col, id_col, k=k, w=w, hash_hex=8)
        .select(F.col(id_col), "fp")
        .distinct()
    )
    dfreq = fps.groupBy("fp").agg(F.count("*").alias("_df"))
    live = fps.join(
        F.broadcast(dfreq.filter(F.col("_df") <= max_df).select("fp")), "fp"
    )
    a = live.select(F.col("fp"), F.col(id_col).alias("id_a"))
    b = live.select(F.col("fp"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def text_hash_embeddings(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 64,
    salt: str = "temb",
) -> DataFrame:
    """Deterministic text embeddings via FEATURE HASHING (the hashing
    trick, Weinberger et al. 2009): every token maps to one of ``dim``
    buckets (md5 mod) with an md5-derived ±1 sign; a document's vector is
    the signed token-count sum per bucket, L2-normalized. No model, no
    vocabulary table, no driver state — the text->vector leg of the
    similarity stack when no learned embeddings exist, and (because every
    coordinate is an md5-replayable integer sum divided by one norm) a
    vector the DuckDB oracle reproduces bit-for-bit.

    Scale shape: one explode + one (id, bucket)-keyed combinable sum,
    then an array build per doc — the same shuffle budget as a word
    count. Signs make bucket collisions cancel in expectation, keeping
    hashed cosines unbiased (the property the hashing-trick paper
    proves).

    Returns (id, embedding array<double> — unit length; all-zero vectors
    of empty docs are dropped).
    """
    # r13: spread before the explode + per-token md5 (functions/partitioning)
    toks = spread(df.select(F.col(id_col), F.col(text_col)), id_col).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
    )
    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col("_t")))
    bucket = (F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % dim)
    sign = F.when(
        F.conv(F.substring(h, 5, 4), 16, 10).cast("bigint") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    sums = (
        toks.select(
            F.col(id_col),
            bucket.alias("_b"),
            sign.cast("long").alias("_s"),
        )
        .groupBy(id_col, "_b")
        .agg(F.sum("_s").alias("_v"))
    )
    dense = sums.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_b"), F.col("_v")))
        ).alias("_m")
    )
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.coalesce(
            F.element_at(F.col("_m"), j.cast("bigint")), F.lit(0)
        ).cast("double"),
    )
    # let-bind the dense array (and its norm) so CollapseProject cannot
    # inline the 64-element map-lookup build into every downstream
    # reference — unbound, the array was evaluated 3x per row (once for
    # the norm fold, once per normalized output, once through the filter)
    # and dominated the operator's runtime (measured ~7 s -> ~1 s at
    # sf0.1). Same arithmetic and fold order, so values are bit-equal.
    from ..functions.vectors import let

    normed = let(
        arr,
        lambda a: let(
            F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)),
            lambda n: F.when(n > 0, F.transform(a, lambda x: x / n)),
        ),
    )
    return (
        dense.select(F.col(id_col), normed.alias("embedding"))
        .filter(F.col("embedding").isNotNull())
    )
